package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tables.Versioned
object TmpProbe3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val tbl = java.nio.file.Files.createTempDirectory("vmp3").toString + "/t"
    val rows = for { y <- 1995 to 1997; src <- Seq("web", "NOT SPECIFIED"); i <- 1 to 4 }
      yield (y.toLong * 100 + i, y * 10L + i, y, src)
    Versioned.publish(spark, tbl, rows.toDF("k", "v", "y", "src"),
      partCol = Some("y,src"), fileStatsKey = Some("k"))
    println("=== v1 entries:")
    Versioned.fileEntriesOf(spark, tbl, 1).foreach(e => println("  " + e))
    val v2 = Versioned.merge(spark, tbl,
      Seq((199601L, 999L, 1996, "web", "U")).toDF("k", "v", "y", "src", "_op"),
      "k", "y,src")
    println("=== v2 entries:")
    Versioned.fileEntriesOf(spark, tbl, v2).foreach(e => println("  " + e))
    println("=== v2 manifest:")
    scala.io.Source.fromFile(s"$tbl/_manifests/2.txt").getLines().foreach(l => println("  " + l))
    spark.stop()
  }
}
