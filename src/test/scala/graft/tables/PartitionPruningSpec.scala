package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Partition pruning — at 100 TB the difference between scanning one
  * partition directory and scanning the table: a filter on the partition
  * column must reach the scan as a PartitionFilter and cut the files read.
  */
class PartitionPruningSpec extends SparkSpec {

  test("filter on the partition column prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft_part").toString + "/orders_p"
    Tables.table(spark, sfDir, "orders")
      .withColumn("order_year", year(col("o_orderdate")))
      .write.partitionBy("order_year").parquet(dir)

    val all = spark.read.parquet(dir)
    val years = all.select("order_year").distinct().count()
    assert(years > 1, "fixture has a single year — pruning test is vacuous")

    val pruned = all.filter(col("order_year") === 1995)
    val exec = pruned.queryExecution.executedPlan
    val scan = exec.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("order_year"),
      s"partition filter did not reach the scan:\n$scan")

    val filesRead = pruned.select(input_file_name()).distinct().count()
    val filesTotal = all.select(input_file_name()).distinct().count()
    assert(filesRead < filesTotal,
      s"pruning read $filesRead of $filesTotal files — nothing pruned")

    // and correctness: pruned read == post-scan filter on unpartitioned data
    val expected = Tables.table(spark, sfDir, "orders")
      .filter(year(col("o_orderdate")) === 1995).count()
    assert(pruned.count() == expected)
  }
}
