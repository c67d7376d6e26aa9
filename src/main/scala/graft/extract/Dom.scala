package graft.extract

import scala.collection.mutable.{ArrayBuffer, LinkedHashMap}

/** Minimal mutable DOM for the extraction engine.
  *
  * Mirrors the cheerio node model the reference relies on
  * (/root/reference/app/types/cheerio.ts:24-48): tag / text / comment
  * nodes, string attribute maps, parent/child links. Built from
  * scratch — no HTML parser library ships with the sandbox Spark
  * distribution, and the engine only needs the operations in
  * SURVEY.md §2 (select, remove, wrap, clone, text, serialize).
  */
sealed trait DomNode {
  var parent: Element = _

  /** Concatenated descendant text (cheerio `.text()` semantics:
    * script/style text INCLUDED — the live reference path never
    * strips scripts, SURVEY.md §0). */
  def text: String = {
    val sb = new StringBuilder
    appendText(sb)
    sb.toString
  }
  private[extract] def appendText(sb: StringBuilder): Unit

  def remove(): Unit = if (parent != null) {
    parent.children -= this
    parent = null
  }
}

final class TextNode(var data: String) extends DomNode {
  private[extract] def appendText(sb: StringBuilder): Unit = sb.append(data)
}

final class CommentNode(var data: String) extends DomNode {
  private[extract] def appendText(sb: StringBuilder): Unit = ()
}

final class Element(val tag: String) extends DomNode {
  val attrs: LinkedHashMap[String, String] = LinkedHashMap.empty
  val children: ArrayBuffer[DomNode] = ArrayBuffer.empty

  private[extract] def appendText(sb: StringBuilder): Unit =
    children.foreach(_.appendText(sb))

  def attr(name: String): Option[String] = attrs.get(name)
  def setAttr(name: String, value: String): Unit = attrs(name) = value
  def removeAttr(name: String): Unit = attrs.remove(name)

  // class-token parse is THE extraction hot spot (selector matching +
  // class-weight scoring hit it constantly) — cache per attr value,
  // invalidated by reference change of the class attr string
  private var classCacheSrc: String = _
  private var classCache: List[String] = Nil
  def classNames: Seq[String] = {
    val cur = attrs.getOrElse("class", null)
    if (cur eq classCacheSrc) classCache
    else {
      classCacheSrc = cur
      classCache =
        if (cur == null) Nil
        else Regexes.Ws.split(cur.trim).toList.filter(_.nonEmpty)
      classCache
    }
  }
  def hasClass(c: String): Boolean = classNames.contains(c)
  /** cheerio addClass semantics: space-separated tokens, each added
    * once. */
  def addClass(c: String): Unit = {
    val toAdd = Regexes.Ws.split(c.trim).filter(_.nonEmpty)
    val cur = classNames
    val merged = cur ++ toAdd.filterNot(cur.contains)
    if (merged.nonEmpty) setAttr("class", merged.mkString(" "))
  }
  def id: Option[String] = attrs.get("id")

  def appendChild(n: DomNode): Unit = { n.remove(); n.parent = this; children += n }
  def prependChild(n: DomNode): Unit = { n.remove(); n.parent = this; children.insert(0, n) }
  def insertChild(i: Int, n: DomNode): Unit = { n.remove(); n.parent = this; children.insert(i, n) }

  def childIndex(n: DomNode): Int = children.indexWhere(_ eq n)

  /** Replace `old` (a direct child) with `nw` in place. */
  def replaceChild(old: DomNode, nw: DomNode): Unit = {
    val i = childIndex(old)
    if (i >= 0) { nw.remove(); nw.parent = this; children(i) = nw; old.parent = null }
  }

  /** Wrap this element in `wrapper` (wrapper takes its tree slot). */
  def wrap(wrapper: Element): Unit = {
    val p = parent
    if (p != null) {
      val i = p.childIndex(this)
      parent = null
      p.children(i) = wrapper
      wrapper.parent = p
      wrapper.appendChild(this)
    }
  }

  def childElements: Seq[Element] = children.collect { case e: Element => e }.toSeq

  /** Visit descendants pre-order (this element excluded) without
    * iterator/Seq allocation per node — the selector-engine hot path. */
  def walkElements(f: Element => Unit): Unit = {
    var i = 0
    while (i < children.length) {
      children(i) match {
        case e: Element => f(e); e.walkElements(f)
        case _          => ()
      }
      i += 1
    }
  }

  /** Pre-order descendants, this element excluded. */
  def descendants: Iterator[Element] = {
    val b = List.newBuilder[Element]
    walkElements(b += _)
    b.result().iterator
  }

  /** Ancestor chain, nearest first, excluding the synthetic root. */
  def ancestors: List[Element] = {
    var cur = parent
    val b = List.newBuilder[Element]
    while (cur != null && cur.tag != "#root") { b += cur; cur = cur.parent }
    b.result()
  }

  def depth: Int = ancestors.length

  def deepClone: Element = {
    val e = new Element(tag)
    attrs.foreach { case (k, v) => e.attrs(k) = v }
    children.foreach {
      case c: Element     => e.appendChild(c.deepClone)
      case t: TextNode    => e.appendChild(new TextNode(t.data))
      case c: CommentNode => e.appendChild(new CommentNode(c.data))
    }
    e
  }

  def select(selector: String): Seq[Element] = Selector.select(this, selector)
  def selectFirst(selector: String): Option[Element] = select(selector).headOption
  def matches(selector: String): Boolean = Selector.matches(this, selector)

  /** True when the element has no children at all (CSS `:empty`:
    * any text node, even whitespace, makes it non-empty). */
  def isCssEmpty: Boolean = children.isEmpty

  /** Serialized inner HTML. */
  def innerHtml: String = {
    val sb = new StringBuilder
    children.foreach(Serializer.write(_, sb))
    sb.toString
  }
  /** Serialized element incl. its own tag. */
  def outerHtml: String = {
    val sb = new StringBuilder
    Serializer.write(this, sb)
    sb.toString
  }
}

object Dom {
  val VoidTags: Set[String] = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "param", "source", "track", "wbr")
  val RawTextTags: Set[String] = Set("script", "style", "textarea", "title")

  def element(tag: String, attrs: (String, String)*): Element = {
    val e = new Element(tag)
    attrs.foreach { case (k, v) => e.attrs(k) = v }
    e
  }
}

private[extract] object Serializer {
  private def escText(s: String, sb: StringBuilder): Unit = s.foreach {
    case '&' => sb.append("&amp;")
    case '<' => sb.append("&lt;")
    case '>' => sb.append("&gt;")
    case c   => sb.append(c)
  }
  private def escAttr(s: String, sb: StringBuilder): Unit = s.foreach {
    case '&' => sb.append("&amp;")
    case '"' => sb.append("&quot;")
    case c   => sb.append(c)
  }

  def write(n: DomNode, sb: StringBuilder): Unit = n match {
    case t: TextNode => t.parent match {
      case p: Element if p != null && Dom.RawTextTags.contains(p.tag) => sb.append(t.data)
      case _ => escText(t.data, sb)
    }
    case c: CommentNode => sb.append("<!--").append(c.data).append("-->")
    case e: Element =>
      if (e.tag == "#root") e.children.foreach(write(_, sb))
      else {
        sb.append('<').append(e.tag)
        e.attrs.foreach { case (k, v) =>
          sb.append(' ').append(k).append("=\"")
          escAttr(v, sb)
          sb.append('"')
        }
        sb.append('>')
        if (!Dom.VoidTags.contains(e.tag)) {
          e.children.foreach(write(_, sb))
          sb.append("</").append(e.tag).append('>')
        }
      }
  }
}
