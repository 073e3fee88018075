package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time a regex-selected subset of SparkEntry.queries N times in
  * one warmed session — separates real per-query cost from JIT/GC noise that
  * single-shot Bench numbers can't. `runMain graft.Profile <sfDir> <regex>
  * [reps=3]`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nameFilter = if (args.length > 1) args(1) else ".*"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val qs = SparkEntry.queries.filter(_._1.matches(nameFilter)).toSeq.sortBy(_._1)
    qs.foreach { case (name, fn) =>
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        println(f"TIMING $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
