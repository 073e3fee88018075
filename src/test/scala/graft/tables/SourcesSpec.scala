package graft.tables

import graft.SparkSpec
import java.nio.file.Files

/** CSV / JSON / ORC source coverage: round-trip the nation and orders tables
  * through each format and require exact row equality with the parquet
  * original (schema-pinned reads — no inference).
  */
class SourcesSpec extends SparkSpec {

  private def roundTrip(name: String)(
      write: (org.apache.spark.sql.DataFrame, String) => Unit,
      read: String => org.apache.spark.sql.DataFrame): Unit = {
    val src = Tables.table(spark, sfDir, name)
    val dir = Files.createTempDirectory(s"graft_src_$name").toString + "/data"
    write(src, dir)
    val back = read(dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
           src.schema.map(f => (f.name, f.dataType)), s"$name schema drift")
    val a = src.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a == b, s"$name rows drift: only-src=${(a -- b).take(2)} only-back=${(b -- a).take(2)}")
  }

  test("CSV round-trip preserves nation exactly") {
    roundTrip("nation")(
      (df, p) => df.write.option("header", "true").csv(p),
      p => Tables.csv(spark, p, Tables.table(spark, sfDir, "nation").schema))
  }

  test("CSV round-trip preserves orders (timestamps included) exactly") {
    roundTrip("orders")(
      (df, p) => df.write.option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]").csv(p),
      p => Tables.csv(spark, p, Tables.table(spark, sfDir, "orders").schema))
  }

  test("JSON round-trip preserves orders exactly") {
    roundTrip("orders")(
      (df, p) => df.write.json(p),
      p => Tables.json(spark, p, Tables.table(spark, sfDir, "orders").schema))
  }

  test("ORC round-trip preserves lineitem exactly") {
    roundTrip("lineitem")(
      (df, p) => df.write.orc(p),
      p => Tables.orc(spark, p))
  }
}
