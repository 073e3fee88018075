package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, lit}

/** Model-based randomized test of the versioned store: a fixed-seed
  * sequence of publish/merge/mergeByFiles/deleteWhere/updateWhere/
  * restore/compactFiles/optimizeTable/vacuum ops runs against BOTH the
  * store and an in-memory model (`Map[key -> (value, partition)]` plus a
  * per-version snapshot history), asserting full-content equality after
  * EVERY op — the composed-operation coverage no single-op spec gives:
  * merges over restored states, optimize over merge debris, time travel
  * across the whole history, DML after layout rewrites.
  *
  * The seed is fixed, so a failure replays deterministically; ops that
  * cannot apply in a state (restore with one version, optimize with
  * nothing to gain) degrade to no-ops exactly like the store's.
  */
class LakeOpsModelSpec extends SparkSpec {

  private type Model = Map[Long, (Long, String)]

  private def toDf(m: Model) = {
    import spark.implicits._
    m.toSeq.map { case (k, (v, p)) => (k, v, p) }.toDF("k", "v", "p")
  }

  private def storeState(tbl: String, ver: Int): Model = {
    import spark.implicits._
    Versioned.readAt(spark, tbl, ver).as[(Long, Long, String)]
      .collect().map { case (k, v, p) => k -> (v, p) }.toMap
  }

  test("30 random composed ops keep the store equal to the model at every step, and all retained history time-travels") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    val parts = Vector("a", "b", "c")
    val tbl = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_model_${System.nanoTime()}").getPath

    var model: Model =
      (1L to 30L).map(k => k -> (k * 10, parts(rnd.nextInt(3)))).toMap
    var ver = Versioned.publish(spark, tbl, toDf(model), partCol = Some("p"),
      fileStatsKey = Some("k"))
    var history = Map(ver -> model)
    var nextKey = 100L

    def checkAll(opName: String): Unit = {
      assert(storeState(tbl, ver) == model, s"after $opName at v$ver")
      // every retained version still serves its snapshot
      history.foreach { case (v, m) =>
        assert(storeState(tbl, v) == m, s"$opName broke time travel to v$v")
      }
    }

    // CDC soundness: a recording commit's change images must transform its
    // predecessor snapshot into its own — deletes remove exact pre-images,
    // inserts add exact post-images, nothing else.
    def checkFeed(opName: String, prev: Model): Unit = {
      import spark.implicits._
      val feed = Versioned.recordedChanges(spark, tbl, ver - 1, ver)
        .select("k", "v", "p", "_change")
        .as[(Long, Long, String, String)].collect()
      val replayed = feed.foldLeft(prev) {
        case (m, (k, fv, fp, "delete")) =>
          assert(m.get(k).contains((fv, fp)),
            s"$opName delete image ($k,$fv,$fp) is not the pre-image in v${ver - 1}")
          m - k
        case (m, _) => m
      }
      val rebuilt = feed.foldLeft(replayed) {
        case (m, (k, fv, fp, "insert")) => m + (k -> (fv, fp))
        case (m, _) => m
      }
      assert(rebuilt == model,
        s"$opName feed replay diverged: images do not transform v${ver - 1} into v$ver")
    }

    (1 to 30).foreach { step =>
      val op = rnd.nextInt(8)
      op match {
        case 0 | 1 => // key-based merge (file-scoped on even steps)
          val existing = model.keys.toVector.sorted
          val us = rnd.shuffle(existing).take(rnd.nextInt(4))
            .map(k => (k, model(k)._1 + 1, parts(rnd.nextInt(3)), "U"))
          val ds = rnd.shuffle(existing.filterNot(us.map(_._1).contains))
            .take(rnd.nextInt(3)).map(k => (k, 0L, "a", "D"))
          val is = (0 until rnd.nextInt(3)).map { _ =>
            nextKey += 1; (nextKey, nextKey * 10, parts(rnd.nextInt(3)), "I")
          }
          val batch = (us ++ ds ++ is).toVector
          if (batch.nonEmpty) {
            val prev = model
            val src = batch.toDF("k", "v", "p", "_op")
            ver = if (op == 0)
              Versioned.merge(spark, tbl, src, "k", "p", recordChanges = true)
            else Versioned.mergeByFiles(spark, tbl, src, "k", "p", recordChanges = true)
            us.foreach { case (k, v, p, _) => model += k -> (v, p) }
            ds.foreach { case (k, _, _, _) => model -= k }
            is.foreach { case (k, v, p, _) => model += k -> (v, p) }
            history += ver -> model
            checkAll(s"merge(op=$op, batch=${batch.size})")
            checkFeed(s"merge(op=$op)", prev)
          }
        case 2 => // predicate delete
          val r = rnd.nextInt(7)
          val prev = model
          val v2 = Versioned.deleteWhere(spark, tbl, col("v") % 7 === r, "p",
            recordChanges = true)
          model = model.filterNot { case (_, (v, _)) => v % 7 == r }
          val changed = v2 != ver
          if (changed) { ver = v2; history += ver -> model }
          checkAll(s"deleteWhere(%7==$r)")
          if (changed) checkFeed(s"deleteWhere(%7==$r)", prev)
        case 3 => // predicate update (may move partitions)
          val r = rnd.nextInt(5)
          val dst = parts(rnd.nextInt(3))
          val prev = model
          val v2 = Versioned.updateWhere(spark, tbl, col("v") % 5 === r,
            Map("v" -> (col("v") + 100L), "p" -> lit(dst)), "p",
            recordChanges = true)
          model = model.map { case (k, (v, p)) =>
            if (v % 5 == r) k -> (v + 100, dst) else k -> (v, p)
          }
          val changed = v2 != ver
          if (changed) { ver = v2; history += ver -> model }
          checkAll(s"updateWhere(%5==$r -> $dst)")
          if (changed) checkFeed(s"updateWhere(%5==$r)", prev)
        case 4 => // restore to a random retained version
          val target = history.keys.toVector.sorted.apply(
            rnd.nextInt(history.size))
          ver = Versioned.restore(spark, tbl, target)
          model = history(target)
          history += ver -> model
          checkAll(s"restore($target)")
        case 5 => // whole-table optimize: content no-op, new version if gain
          val v2 = Versioned.optimizeTable(spark, tbl, "k", "p",
            targetRows = 1 + rnd.nextInt(20))
          if (v2 != ver) { ver = v2; history += ver -> model }
          checkAll("optimizeTable")
        case 6 => // compact one existing partition: content no-op
          val present = model.values.map(_._2).toSet
          if (present.nonEmpty) {
            val p = present.toVector.sorted.apply(rnd.nextInt(present.size))
            ver = Versioned.compactFiles(spark, tbl, s"p=$p", "k", "p")
            history += ver -> model
            checkAll(s"compactFiles(p=$p)")
          }
        case 7 => // retention: keep the newest 4 retained versions
          val keep = history.keys.toVector.sorted.takeRight(4).toSet + ver
          Versioned.vacuum(spark, tbl, keep, retentionMs = 0)
          history = history.view.filterKeys(keep).toMap
          checkAll(s"vacuum(keep=${keep.toVector.sorted.mkString(",")})")
      }
      if (model.isEmpty) { // refill so later ops stay meaningful
        nextKey += 1
        val k = nextKey
        model += k -> (k * 10, "a")
        ver = Versioned.merge(spark, tbl,
          Seq((k, k * 10, "a", "I")).toDF("k", "v", "p", "_op"), "k", "p")
        history += ver -> model
      }
    }
    assert(history.size >= 2, "the walk should retain a multi-version history")
  }
}
