package graft.extract

import java.util.regex.Pattern

/** Precompiled patterns for the per-turn hot path — String.replaceAll
  * / String.split / `".r"` recompile their regex on EVERY call, which
  * is pure per-document overhead at millions of turns.
  */
private[extract] object Regexes {
  // (?U) ≈ JS \s (includes  )
  val UWs: Pattern = Pattern.compile("(?U)\\s+")
  val Ws: Pattern = Pattern.compile("\\s+")
  val BrRuns: Pattern = Pattern.compile("(\\s*<br\\s*/?>\\s*){3,}")
  val Language: Pattern = Pattern.compile("language-(\\w+)")
  val Punct: Pattern = Pattern.compile("[.。!！?？]")

  // math (reference order: $…$ BEFORE $$…$$ — bug-compatible)
  val MathInline: Pattern = Pattern.compile("\\$([^\\$]+)\\$")
  val MathDisplay: Pattern = Pattern.compile("\\$\\$([^\\$]+)\\$\\$")
  val MathEquation: Pattern = Pattern.compile("\\\\begin\\{equation\\}([\\s\\S]*?)\\\\end\\{equation\\}")
  val MathAlign: Pattern = Pattern.compile("\\\\begin\\{align\\}([\\s\\S]*?)\\\\end\\{align\\}")

  // title cleanup chain
  val TitleSep: Pattern = Pattern.compile("\\s*[|\\-–_]\\s*.+$")
  val TitleBracket: Pattern = Pattern.compile("\\s*[(\\[{].*?[)\\]}]\\s*")
  val TitleTag: Pattern = Pattern.compile("<[^>]+>")
  val TitleSpecial: Pattern = Pattern.compile("[^\\p{L}\\p{N}\\p{P}\\p{Z}]")

  /** Exactly \\p{IsWhite_Space} -- the (?U)\\s character set. */
  @inline def isUnicodeWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000b' || c == '\f' ||
    c == '\r' || c == '\u0085' || c == '\u00a0' || c == '\u1680' ||
    (c >= '\u2000' && c <= '\u200a') || c == '\u2028' || c == '\u2029' ||
    c == '\u202f' || c == '\u205f' || c == '\u3000'

  /** `(?U)\s+` → " " as a single-pass scanner (regex-equivalent,
    * measured ~30% of task CPU when done via Matcher on every text
    * node). Returns the input unchanged when nothing collapses. */
  def collapseWs(s: String): String = {
    val n = s.length
    var i = 0
    var dirty = false
    while (i < n && !dirty) {
      val c = s.charAt(i)
      if (isUnicodeWs(c) && (c != ' ' || (i + 1 < n && isUnicodeWs(s.charAt(i + 1)))))
        dirty = true
      i += 1
    }
    if (!dirty) return s
    val sb = new java.lang.StringBuilder(n)
    var inWs = false
    i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (isUnicodeWs(c)) inWs = true
      else {
        if (inWs) { sb.append(' '); inWs = false }
        sb.append(c)
      }
      i += 1
    }
    if (inWs) sb.append(' ')
    sb.toString
  }
}
