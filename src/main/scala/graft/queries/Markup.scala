package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HTML / markup extraction: boilerplate-strip + main-content extraction.
  *
  * Mirrors the reference's map-only text transform shape
  * (`Sample Client/SampleClient.cpp:32-66` runs a pure per-record map over
  * document text); the operator itself is the classic web-corpus cleaning
  * stage every LLM training pipeline runs ahead of dedup/quality scoring.
  *
  * Fixture synthesis follows the multimodal codec pattern (q161–q174): each
  * document's text is deterministically wrapped into a full HTML page —
  * head with title/style/script, nav/header/footer/aside boilerplate, a
  * link-farm div, and the text itself as `<p>` blocks with inline `<b>`/`<a>`
  * markup and entity-escaped characters. The extractor is a GENERAL
  * single-pass HTML tokenizer (rawtext script/style handling, comments,
  * attributes, entities, nested boilerplate containers); the DuckDB oracle
  * replays the strip arithmetically from the raw text because the wrap is
  * lossless by construction.
  *
  * Scale: map-only — one document never leaves its task; no shuffle except
  * the final presentation sort. At 100 TB this runs at scan speed.
  */
object Markup {

  // ------------------------------------------------------------ synthesis

  private val navLabels = Vector("home", "about", "archive", "contact")

  /** Escape the three HTML-active chars (noop on the [a-z0-9 ] corpus, but
    * the extractor's entity decoding is exercised by spec fixtures).
    */
  def escape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c   => c.toString
    }

  /** Deterministic page wrap. Inline markup: word k (1-based) becomes a link
    * when k % 13 == 0, bold when k % 7 == 0; paragraphs are runs of 12
    * words; nav carries 2 + doc_id % 3 links; the link-farm div (4 links,
    * link-chars majority) is the density-drop target; nav/header/aside/
    * footer are the tag-drop targets; title/script/style exercise head and
    * rawtext handling.
    */
  def toHtml(docId: Long, lang: String, source: String, text: String): String = {
    // Oracle-parity invariant (r10 advice): the q189 DuckDB replay assumes
    // non-empty, single-spaced text — an empty doc would give the extractor
    // n_kept=0 vs the oracle's ceil(1/12)=1, and a double space breaks
    // main_chars parity (split(' ') manufactures empty "words"). True of
    // every shipped corpus; fail LOUDLY here the day a generator changes,
    // instead of silently hash-mismatching the round.
    require(text.nonEmpty && !text.contains("  "),
      s"q189 oracle invariant violated for doc $docId: text must be " +
        "non-empty and single-spaced")
    val sb = new StringBuilder(text.length * 2 + 512)
    sb ++= "<!DOCTYPE html>\n"
    sb ++= s"""<html lang="${escape(lang)}"><head>\n"""
    sb ++= s"<title>doc $docId &amp; ${escape(source)}</title>\n"
    sb ++= "<style>p { margin: 0; } nav > a { color: #00c; }</style>\n"
    sb ++= s"""<script>var docId = $docId; if (docId < 0) { alert("x & y"); }</script>\n"""
    sb ++= "</head><body>\n<nav>"
    val navN = (2 + docId % 3).toInt
    var i = 0
    while (i < navN) {
      if (i > 0) sb += ' '
      sb ++= s"""<a href="/${navLabels(i)}">${navLabels(i)}</a>"""
      i += 1
    }
    sb ++= "</nav>\n"
    sb ++= s"<header><h1>Document $docId</h1></header>\n<main>\n"
    val words = text.split(' ')
    var k = 0
    while (k < words.length) {
      if (k % 12 == 0) sb ++= (if (k == 0) "<p>" else "</p>\n<p>")
      else sb += ' '
      val w = escape(words(k))
      val ord = k + 1
      if (ord % 13 == 0) sb ++= s"""<a href="#w$ord">$w</a>"""
      else if (ord % 7 == 0) sb ++= s"<b>$w</b>"
      else sb ++= w
      k += 1
    }
    if (words.nonEmpty) sb ++= "</p>\n"
    sb ++= "</main>\n"
    sb ++= """<div class="linkfarm">more: <a href="/t/1">alpha</a> <a href="/t/2">beta</a> <a href="/t/3">gamma</a> <a href="/t/4">delta</a></div>""" + "\n"
    sb ++= s"<aside>related reading for ${escape(source)}</aside>\n"
    sb ++= s"""<footer>&copy; ${escape(source)} <a href="/terms">terms</a> all rights reserved</footer>\n"""
    sb ++= "</body></html>\n"
    sb.toString
  }

  // ------------------------------------------------------------ extractor

  /** One leaf text block as segmented by block-level tags. */
  final case class Block(text: String, nLinks: Int, linkChars: Int, tagDropped: Boolean) {
    /** Link-farm heuristic: ≥2 anchors and link text is the majority. */
    def densityDropped: Boolean =
      !tagDropped && nLinks >= 2 && linkChars * 2 > text.length
    def kept: Boolean = !tagDropped && !densityDropped
  }

  final case class Page(title: String, lang: String, blocks: Vector[Block], nLinks: Int) {
    def mainText: String = blocks.filter(_.kept).map(_.text).mkString(" ")
  }

  private val blockTags = Set("p", "div", "li", "ul", "ol", "main", "body",
    "section", "article", "table", "tr", "td", "th", "br", "nav", "header",
    "footer", "aside", "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre")
  private val boilTags = Set("nav", "header", "footer", "aside")
  private val rawTextTags = Set("script", "style")
  private val voidTags = Set("br", "hr", "img", "meta", "link", "input")

  private val namedEntities =
    Map("amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'", "nbsp" -> " ")

  /** Decode &name; and &#N;/&#xN; entities; unknown entities pass through. */
  def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val name = s.substring(i + 1, semi)
          // Code points above the BMP need a surrogate pair — a bare
          // .toChar would silently truncate &#x1F600;-class entities.
          def cp(v: Int): Option[String] =
            if (Character.isValidCodePoint(v)) Some(new String(Character.toChars(v))) else None
          val rep =
            if (name.startsWith("#x") || name.startsWith("#X"))
              scala.util.Try(Integer.parseInt(name.drop(2), 16)).toOption.flatMap(cp)
            else if (name.startsWith("#"))
              scala.util.Try(name.drop(1).toInt).toOption.flatMap(cp)
            else namedEntities.get(name)
          rep match {
            case Some(r) => out ++= r; i = semi + 1
            case None    => out += c; i += 1
          }
        } else { out += c; i += 1 }
      } else { out += c; i += 1 }
    }
    out.toString
  }

  /** Single-pass tokenizer + boilerplate classifier over an HTML page.
    *
    * Blocks are leaf text runs delimited by block-level tags; whitespace is
    * HTML-collapsed (runs → one space, trimmed); blocks opened inside
    * nav/header/footer/aside (any nesting) are tag-dropped; script/style
    * bodies are rawtext (consumed to the matching close tag, never text);
    * anchors are counted page-wide and their visible chars per-block for
    * the link-density drop. Title and `<html lang>` are captured from head.
    */
  def extract(html: String): Page = {
    val n = html.length
    var i = 0
    var title = ""
    var lang = ""
    var inBody = false
    var inTitle = false
    var boilDepth = 0 // nesting depth inside boilerplate containers
    var inLink = false
    var nLinks = 0
    val blocks = Vector.newBuilder[Block]
    val cur = new StringBuilder
    var curLinkChars = 0
    var curLinks = 0
    var curBoil = false // current block opened under a boilerplate container

    def flush(): Unit = {
      // HTML whitespace collapse: runs → single space, trim ends.
      val t = cur.toString.replaceAll("\\s+", " ").trim
      if (t.nonEmpty) blocks += Block(t, curLinks, curLinkChars, curBoil)
      cur.clear(); curLinkChars = 0; curLinks = 0
      curBoil = boilDepth > 0
    }

    def tagNameAt(p: Int): String = {
      var j = p
      while (j < n && (html.charAt(j).isLetterOrDigit)) j += 1
      html.substring(p, j).toLowerCase
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          val e = html.indexOf('>', i)
          i = if (e < 0) n else e + 1
        } else {
          val closing = i + 1 < n && html.charAt(i + 1) == '/'
          val nameStart = if (closing) i + 2 else i + 1
          val name = tagNameAt(nameStart)
          // scan to tag end, honoring quoted attribute values
          var j = nameStart + name.length
          var quote: Char = 0
          var end = -1
          while (j < n && end < 0) {
            val ch = html.charAt(j)
            if (quote != 0) { if (ch == quote) quote = 0 }
            else if (ch == '"' || ch == '\'') quote = ch
            else if (ch == '>') end = j
            j += 1
          }
          val tagEnd = if (end < 0) n else end
          val attrs = html.substring(math.min(nameStart + name.length, n), math.min(tagEnd, n))

          if (!closing && name == "html") {
            val m = """(?i)\blang\s*=\s*["']([^"']*)["']""".r.findFirstMatchIn(attrs)
            m.foreach(mm => lang = mm.group(1))
          }
          if (name == "title") inTitle = !closing
          if (name == "body" && !closing) inBody = true

          if (!closing && rawTextTags(name)) {
            // rawtext: consume to the matching close tag. Case-insensitive
            // region scan — NOT html.toLowerCase.indexOf, which would
            // allocate a full page copy per script/style element.
            val close = s"</$name"
            var e = tagEnd + 1
            val lim = n - close.length
            while (e <= lim && !html.regionMatches(true, e, close, 0, close.length)) e += 1
            if (e > lim) i = n
            else {
              val ge = html.indexOf('>', e)
              i = if (ge < 0) n else ge + 1
            }
          } else {
            if (inBody && blockTags(name)) {
              flush()
              if (boilTags(name) && !voidTags(name)) {
                if (closing) { if (boilDepth > 0) boilDepth -= 1 }
                else boilDepth += 1
                curBoil = boilDepth > 0
              }
            }
            if (name == "a" && inBody) {
              if (closing) inLink = false
              else {
                // self-closing <a/> never carries text
                val selfClosed = attrs.trim.endsWith("/")
                nLinks += 1
                curLinks += 1
                if (!selfClosed) inLink = true
              }
            }
            i = tagEnd + 1
          }
        }
      } else {
        // text run up to the next tag
        var j = i
        while (j < n && html.charAt(j) != '<') j += 1
        val raw = unescape(html.substring(i, j))
        if (inTitle) title += raw
        else if (inBody) {
          cur ++= raw
          if (inLink) curLinkChars += raw.replaceAll("\\s+", " ").trim.length
        }
        i = j
      }
    }
    flush()
    Page(title.replaceAll("\\s+", " ").trim, lang, blocks.result(), nLinks)
  }

  // ------------------------------------------------------------ query

  /** q189: documents → synthesized HTML pages → boilerplate-stripped main
    * content + page stats. Map-only; presentation sort only.
    */
  def htmlExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.tables.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
      .as[(Long, String, String, String)]
      .map { case (id, lang, source, text) =>
        val page = extract(toHtml(id, lang, source, text))
        val main = page.mainText
        (id, page.title, page.lang,
          page.blocks.length, page.blocks.count(_.kept),
          page.blocks.count(_.tagDropped), page.blocks.count(_.densityDropped),
          page.nLinks, main.length.toLong, main)
      }
      .toDF("doc_id", "title", "page_lang", "n_blocks", "n_kept",
        "n_tag_dropped", "n_density_dropped", "n_links", "main_chars", "main")
      .select(col("doc_id"), col("title"), col("page_lang"), col("n_blocks"),
        col("n_kept"), col("n_tag_dropped"), col("n_density_dropped"),
        col("n_links"), col("main_chars"),
        expr("cast(conv(substring(md5(main), 1, 15), 16, 10) as bigint)").as("main_h"))
      .orderBy("doc_id")
  }

  /** DuckDB replay: the wrap is lossless over the [a-z0-9 ] corpus, so the
    * extracted main text must equal the raw text verbatim; every count is
    * arithmetic over the word count and doc_id. 60-bit portable md5 per the
    * repo convention.
    */
  private val htmlExtractOracle: String =
    """WITH d AS (SELECT doc_id, lang, source, text,
      |                  len(string_split(text, ' ')) AS nw, length(text) AS nc
      |           FROM documents)
      |SELECT doc_id,
      |       'doc ' || doc_id || ' & ' || source AS title,
      |       lang AS page_lang,
      |       CAST(CAST(ceil(nw / 12.0) AS BIGINT) + 5 AS INT) AS n_blocks,
      |       CAST(ceil(nw / 12.0) AS INT) AS n_kept,
      |       4 AS n_tag_dropped,
      |       1 AS n_density_dropped,
      |       CAST(2 + (doc_id % 3) + (nw // 13) + 5 AS INT) AS n_links,
      |       CAST(nc AS BIGINT) AS main_chars,
      |       CAST(list_sum(list_transform(range(1, 16),
      |         i -> CAST(strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1 AS BIGINT)
      |              * (CAST(1 AS BIGINT) << (4 * (15 - i))))) AS BIGINT) AS main_h
      |FROM d ORDER BY doc_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q189_html_extract" -> (htmlExtract _)
  )

  val oracles: Map[String, String] = Map(
    "q189_html_extract" -> htmlExtractOracle
  )
}
