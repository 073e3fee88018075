package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Codec-level contracts for the HTML extractor: entity decode, the
  * tokenizer on FOREIGN hand-written markup (comments, quoted '>' in
  * attributes, rawtext script containing fake tags, nested boilerplate),
  * the link-density drop, and lossless round trip of the synthesized wrap.
  */
class MarkupSpec extends AnyFunSuite {

  test("entity decode: named, decimal, hex, unknown passthrough, bare ampersand") {
    assert(Markup.unescape("a &amp; b &lt;c&gt; &quot;d&quot; &apos;e&apos;") == "a & b <c> \"d\" 'e'")
    assert(Markup.unescape("&#65;&#x42;&#x63;") == "ABc")
    assert(Markup.unescape("&#x1F600;") == new String(Character.toChars(0x1F600)))
    assert(Markup.unescape("&#x110000;") == "&#x110000;") // beyond Unicode: passthrough
    assert(Markup.unescape("&bogus; & &toolongtoolong;") == "&bogus; & &toolongtoolong;")
    assert(Markup.unescape("no entities") == "no entities")
  }

  test("escape/unescape round-trips HTML-active characters") {
    val s = "x < y & y > z"
    assert(Markup.unescape(Markup.escape(s)) == s)
    assert(Markup.escape(s) == "x &lt; y &amp; y &gt; z")
  }

  test("foreign HTML: comments, quoted '>' in attrs, rawtext script, nested boilerplate") {
    val html =
      """<html lang="fr"><head><title>T &amp; U</title>
        |<script>if (a < b) { document.write("<p>fake para</p>"); }</script>
        |</head><body>
        |<!-- a comment with <p>tags</p> inside -->
        |<nav><div>nested <a href="/x">boiler</a> block</div></nav>
        |<p data-x="a > b">real &#99;ontent here</p>
        |<div>more: <a href="/1">eleven</a> <a href="/2">twelve</a></div>
        |<p>second real paragraph with a <a href="/3">link</a> in flowing text</p>
        |</body></html>""".stripMargin
    val page = Markup.extract(html)
    assert(page.title == "T & U")
    assert(page.lang == "fr")
    // nav's nested div is still tag-dropped (depth tracking)
    val dropped = page.blocks.filter(_.tagDropped).map(_.text)
    assert(dropped == Vector("nested boiler block"))
    // the 2-anchor majority-link div is density-dropped
    val dens = page.blocks.filter(_.densityDropped).map(_.text)
    assert(dens == Vector("more: eleven twelve"))
    // the fake script para and the comment produced no blocks
    assert(page.mainText == "real content here second real paragraph with a link in flowing text")
    assert(page.nLinks == 4)
  }

  test("a flowing paragraph with one link survives; whitespace is HTML-collapsed") {
    val page = Markup.extract(
      "<html><body><p>  spaced\n\n   out <b>words</b> <a href='/'>go</a>  here </p></body></html>")
    assert(page.mainText == "spaced out words go here")
    assert(page.blocks.count(_.kept) == 1)
  }

  test("synthesized wrap round-trips the corpus text exactly (tricky word counts)") {
    val texts = Seq(
      "one",                                      // single word, single para
      (1 to 12).map(i => s"w$i").mkString(" "),   // exactly one full para
      (1 to 13).map(i => s"w$i").mkString(" "),   // 13th word is a link, 1-word 2nd para
      (1 to 91).map(i => s"w$i").mkString(" "),   // word 91 is both 7- and 13-multiple
      (1 to 26).map(i => s"w$i").mkString(" "))
    texts.zipWithIndex.foreach { case (t, id) =>
      val page = Markup.extract(Markup.toHtml(id.toLong, "en", "web", t))
      assert(page.mainText == t, s"round-trip drift for id=$id")
      assert(page.title == s"doc $id & web")
      assert(page.lang == "en")
      val nw = t.split(' ').length
      assert(page.blocks.count(_.kept) == (nw + 11) / 12)
      assert(page.blocks.count(_.tagDropped) == 4)
      assert(page.blocks.count(_.densityDropped) == 1)
      assert(page.nLinks == (2 + id % 3) + nw / 13 + 5)
    }
  }

  test("text containing HTML-active chars survives the wrap via entity escaping") {
    val t = "a<b & c>d plain"
    val page = Markup.extract(Markup.toHtml(9L, "en", "web", t))
    assert(page.mainText == t)
  }
}

/** Plan + corpus-level contract for the registered q189 query. */
class MarkupQuerySpec extends graft.SparkSpec {
  test("q189 plan is map-only: one pruned scan, no exchange before the presentation sort") {
    val df = Markup.all("q189_html_extract")(spark, sfDir)
    df.collect()
    val plan = org.apache.spark.sql.GraftSqlBridge.executedPlan(df).toString
    // scan prunes to the four consumed columns (n_chars must not be read)
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(read.split(",").length == 4, s"expected a 4-column scan, got: $read")
    assert(!read.contains("n_chars"), read)
    // map-only: the ONLY exchange is the final global sort's range partition
    val exchanges = "Exchange (\\w+)".r.findAllMatchIn(plan).map(_.group(1)).toList
    assert(exchanges.forall(_ == "rangepartitioning"), s"non-sort exchange in a map-only plan: $exchanges\n$plan")
  }

  test("q189 main text equals the raw document text for every corpus doc") {
    import org.apache.spark.sql.functions._
    val bad = Markup.all("q189_html_extract")(spark, sfDir)
      .join(graft.tables.Tables.documents(spark, sfDir), Seq("doc_id"))
      .filter(col("main_chars") =!= length(col("text")) ||
              col("main_h") =!= expr("cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint)"))
      .count()
    assert(bad == 0L)
  }
}
