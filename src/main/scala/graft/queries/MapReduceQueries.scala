package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.MapReduce
import graft.tables.Tables._

/** Queries expressed through the generic typed MapReduce layer (graft.core),
  * proving the reference's own programming model runs distributed on Spark and
  * hash-matches a relational oracle.
  */
object MapReduceQueries {

  /** Word count over documents.text via `MapReduce.run` — the canonical
    * MapReduce client program (the reference's sample is the char-level
    * variant, `Sample Client/SampleClient.cpp:32-66`).
    */
  def mrWordCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    MapReduce.run(documents(spark, dir).select("text").as[String])(
      (text: String) => text.split(" ").iterator.filter(_.nonEmpty).map(w => (w, 1L)))(
      (word: String, counts: Iterator[Long]) => Iterator((word, counts.sum)))
      .toDF("word", "cnt")
      .orderBy("word")
  }

  /** Per-language char count via the sorted-values variant (`runSorted`) —
    * exercises the secondary-sort path that reproduces the reference's
    * sort-based shuffle observable.
    */
  def mrCharsByLang(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    MapReduce.runSorted(
      documents(spark, dir).select("lang", "n_chars").as[(String, Long)])(
      (r: (String, Long)) => Iterator((r._1, r._2)))(
      (lang: String, chars: Iterator[Long]) => {
        var n = 0L; var sum = 0L
        chars.foreach { c => n += 1; sum += c }
        Iterator((lang, n, sum))
      })
      .toDF("lang", "n_docs", "sum_chars")
      .orderBy("lang")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_mr_word_count"    -> mrWordCount _,
    "q30_mr_chars_by_lang" -> mrCharsByLang _,
  )

  val oracles: Map[String, String] = Map(
    "q29_mr_word_count" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin,
    "q30_mr_chars_by_lang" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
  )
}
