package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.BitmapFilter
import graft.io.Cdc
import graft.pipeline.{Profile, Sampling}

/** Round-5 session-5 operators: priority sampling, temperature
  * rebalancing, column profiling, snapshot CDC, bitmap semijoin. */
class SampleOpsSpec extends AnyFunSuite {
  import TestSpark._

  /** Independent reference hash32 (straight BigInt formula — not the
    * limb-split production expression). */
  private def refHash32(id: Long): Long =
    ((BigInt(id) * BigInt(2654435761L)) mod BigInt(4294967296L)).toLong

  private val docS = StructType(Seq(StructField("doc_id", LongType),
    StructField("w", LongType)))

  test("prioritySample == exact-rational top-k (double ranking is faithful)") {
    // weights spread over two orders of magnitude; ids break any tie
    val rows = (0L to 300L).map(i => Row(i, 1L + (i * 37) % 400))
    val d = df(docS, rows)
    val got = Sampling.prioritySample(d, "doc_id", col("w"), 25)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    // exact rational ranking: w/(h+1) compared by BigInt cross-mult
    val expect = rows.map(r => (r.getLong(0), r.getLong(1)))
      .sortWith { case ((id1, w1), (id2, w2)) =>
        val l = BigInt(w1) * (BigInt(refHash32(id2)) + 1)
        val r = BigInt(w2) * (BigInt(refHash32(id1)) + 1)
        if (l != r) l > r else id1 < id2
      }.take(25).map(_._1)
    assert(got === expect)
  }

  test("prioritySample: zero weight fails loudly, null ids excluded") {
    val d = df(docS, Seq(Row(1L, 0L), Row(2L, 5L)))
    val e = intercept[Exception] {
      Sampling.prioritySample(d, "doc_id", col("w"), 2).collect()
    }
    assert(e.getMessage.contains("weight outside"))
    val withNull = df(docS, Seq(Row(null, 5L), Row(2L, 5L)))
    assert(Sampling.prioritySample(withNull, "doc_id", col("w"), 5)
      .count() === 1)
  }

  private val langS = StructType(Seq(StructField("doc_id", LongType),
    StructField("lang", StringType)))

  test("rebalanceSqrt: smallest domain keeps all; bigger domains thin by sqrt law") {
    // en: 400 docs, de: 100, fr: 25 (4× steps — sqrt law halves twice)
    val rows = (0L until 400L).map(Row(_, "en")) ++
      (1000L until 1100L).map(Row(_, "de")) ++ (2000L until 2025L).map(Row(_, "fr"))
    val d = df(langS, rows)
    val thr = Sampling.rebalanceThresholds(d, "lang").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(thr("fr")._2 === 4294967296L)            // keeps everything
    assert(thr("de")._2 === 2147483648L)            // sqrt(1/4) = 1/2
    assert(thr("en")._2 === 1073741824L)            // sqrt(1/16) = 1/4
    val kept = Sampling.rebalanceSqrt(d, "doc_id", "lang")
    assert(kept.filter(col("lang") === "fr").count() === 25)
    // kept set is a strict, deterministic subset of the big domains
    val en = kept.filter(col("lang") === "en").count()
    assert(en > 0 && en < 400)
    assert(kept.count() === Sampling.rebalanceSqrt(d, "doc_id", "lang").count())
  }

  test("profile: nulls and distincts exact") {
    val s = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType)))
    val d = df(s, Seq(Row(1L, "a"), Row(2L, "a"), Row(3L, null),
      Row(4L, "b"), Row(null, null)))
    val got = Profile.profile(d, Seq("id", "v")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("id") === ((5L, 1L, 4L)))
    assert(got("v") === ((5L, 2L, 2L)))
  }

  private val snapS = StructType(Seq(StructField("k", LongType),
    StructField("v", StringType)))

  test("snapshotDiff classifies all four ops; null transitions are updates") {
    val o = df(snapS, Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "c"), Row(5L, null)))
    val n = df(snapS, Seq(Row(2L, "b"), Row(3L, "C"), Row(4L, "d"), Row(5L, "x")))
    val got = Cdc.snapshotDiff(o, n, "k", Seq("v")).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("op")).toMap
    assert(got === Map(1L -> "delete", 2L -> "unchanged", 3L -> "update",
      4L -> "insert", 5L -> "update"))
    assert(Cdc.changes(o, n, "k", Seq("v")).count() === 4)
  }

  test("applyChanges: round-trip identity applyChanges(old, changes(old,new)) == new, idempotent") {
    val o = df(snapS, Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "c"), Row(5L, null)))
    val n = df(snapS, Seq(Row(2L, "b"), Row(3L, "C"), Row(4L, "d"), Row(5L, "x")))
    val ch = Cdc.changes(o, n, "k", Seq("v"))
    val applied = Cdc.applyChanges(o, ch, "k", Seq("v"))
    assert(rowsOf(applied) === rowsOf(n))
    // upsert idempotence: re-applying the same change set is a no-op
    // (the delete keys are already gone; upserts overwrite themselves)
    val again = Cdc.applyChanges(applied, ch, "k", Seq("v"))
    assert(rowsOf(again) === rowsOf(n))
  }

  test("RangeStab == brute-force inequality join on random ranges, including empty hits") {
    import graft.core.RangeStab
    val rS = StructType(Seq(StructField("rid", LongType),
      StructField("s", LongType), StructField("e", LongType)))
    val pS = StructType(Seq(StructField("pid", LongType), StructField("v", LongType)))
    val rnd = new scala.util.Random(7)
    val ranges = df(rS, (1L to 40L).map { i =>
      val s0 = rnd.nextInt(900).toLong; Row(i, s0, s0 + 1 + rnd.nextInt(120))
    })
    val probes = df(pS, (1L to 200L).map(i => Row(i, rnd.nextInt(1100).toLong)))
    val got = rowsOf(RangeStab.stab(ranges, probes, "s", "e", "v", bucket = 64L)
      .select("pid", "rid"))
    val brute = rowsOf(probes.join(ranges,
        col("v") >= col("s") && col("v") < col("e"))
      .select("pid", "rid"))
    assert(got === brute)
    assert(got.nonEmpty)
  }

  private val keyS = StructType(Seq(StructField("k", LongType)))

  test("bloomSemiJoin == plain semijoin; bitmap has no false negatives and prunes") {
    val probe = df(keyS, (1L to 500L).map(Row(_)))
    val build = df(keyS, (1L to 50L).map(Row(_))).withColumnRenamed("k", "bk")
    val got = BitmapFilter.bloomSemiJoin(probe, "k", build, "bk", bits = 4096)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === (1L to 50L))
    // no false negative: every build key's bit is set in the bitmap
    val words = BitmapFilter.keyBitmap(build, "bk", 4096).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 50L).foreach { k =>
      val b = refHash32(k) % 4096
      assert(((words(b / 64) >> (b % 64).toInt) & 1L) === 1L, s"key $k bit unset")
    }
    // the prefilter genuinely prunes: far fewer than all probe keys pass
    val passed = probe.filter(col("k").isNotNull).collect().map(_.getLong(0))
      .count { k =>
        val b = refHash32(k) % 4096
        words.get(b / 64).exists(m => ((m >> (b % 64).toInt) & 1L) == 1L)
      }
    assert(passed >= 50 && passed < 150, s"prefilter passed $passed of 500")
  }

  test("cmsHeavyHitters: exact top-k ordering, CMS bound holds, shard merge is exact") {
    // planted Zipf-ish skew: key k appears 1000/k times for k in 1..50,
    // plus a long tail of singletons — exact hitters are 1..k ordered
    val rows = (1L to 50L).flatMap(k => Seq.fill((1000 / k).toInt)(Row(k))) ++
      (1000L to 1500L).map(Row(_))
    val d = df(keyS, rows)
    val got = graft.core.Sketches.cmsHeavyHitters(d, "k", topK = 10).collect()
    // truth side: top-10 by (count desc, key asc) is exactly keys 1..10
    assert(got.map(_.getLong(0)).toSeq === (1L to 10L))
    got.foreach { r =>
      assert(r.getLong(1) === (1000 / r.getLong(0)), s"exact count of ${r.getLong(0)}")
      assert(r.getBoolean(2), s"CMS bound violated for key ${r.getLong(0)}")
      assert(r.getBoolean(3), s"shard-merged estimate differs for key ${r.getLong(0)}")
    }
    // ties at the cut: equal-count keys resolve by key asc, both engines
    val tied = df(keyS, (1L to 30L).map(Row(_)) ++ (1L to 30L).map(Row(_)))
    val t = graft.core.Sketches.cmsHeavyHitters(tied, "k", topK = 5).collect()
    assert(t.map(_.getLong(0)).toSeq === (1L to 5L))
  }

  test("kmvSetOps: exact pair counts, estimator bounds, shard merge exact") {
    val setS = StructType(Seq(StructField("g", StringType),
      StructField("e", LongType)))
    // A = 1..2000, B = 1001..3000 (inter 1000, union 3000 — both sides
    // larger than k=1024, so the union/intersection ESTIMATORS are
    // genuinely exercised, not the small-set exact path); C = 1..10
    // (subset of A — small-set exact path); duplicates must collapse
    val rows = (1L to 2000L).map(Row("A", _)) ++
      (1001L to 3000L).map(Row("B", _)) ++
      (1L to 10L).map(Row("C", _)) ++ (1L to 10L).map(Row("C", _))
    val got = graft.core.Sketches.kmvSetOps(df(setS, rows), "g", "e", k = 1024)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5),
          r.getBoolean(6))).toMap
    // B ∩ C is empty (C = 1..10, B starts at 1001): pairs with an
    // empty exact intersection are absent on BOTH engines (inner-join
    // semantics), so only two pairs surface
    assert(got.keySet === Set(("A", "B"), ("A", "C")))
    assert(got(("A", "B")) === ((3000L, 1000L, true, true, true)))
    assert(got(("A", "C")) === ((2000L, 10L, true, true, true)))
    // empty input → empty frame with the full schema, no crash
    val empty = graft.core.Sketches.kmvSetOps(
      df(setS, Seq.empty), "g", "e", k = 16)
    assert(empty.count() === 0L && empty.columns.length === 7)
  }
}
