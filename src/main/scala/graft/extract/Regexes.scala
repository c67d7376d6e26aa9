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

  def collapseWs(s: String): String = UWs.matcher(s).replaceAll(" ")
}
