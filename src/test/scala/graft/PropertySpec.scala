package graft

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sdv.SdvAgg

/** Randomized property tests (fixed seed) mirroring the
  * gSSURGO_ValidateData-style invariants from SURVEY §5: WTA bounded by
  * input extremes, DCD pct ≤ 100, slice thickness bounded by slice
  * width, dominant rating drawn from the input set. */
class PropertySpec extends AnyFunSuite {
  import TestSpark._

  private val rnd = new Random(42)

  private val numSchema = StructType(Seq(
    StructField("mukey", StringType), StructField("cokey", LongType),
    StructField("comppct", DoubleType), StructField("rating", DoubleType),
    StructField("ratingOrd", DoubleType)))

  private def randomRatingTable(nMu: Int, maxComp: Int): Seq[Row] =
    (1 to nMu).flatMap { m =>
      (1 to (1 + rnd.nextInt(maxComp))).map { c =>
        val r = (rnd.nextInt(1000) + 1).toDouble
        Row(s"m$m", (m * 100 + c).toLong, (rnd.nextInt(60) + 1).toDouble, r, r)
      }
    }

  test("property: WTA lies within [min,max] of each mapunit's ratings") {
    val rows = randomRatingTable(50, 5)
    val d = df(numSchema, rows)
    val bounds = rows.groupBy(_.getString(0)).map { case (m, rs) =>
      m -> (rs.map(_.getDouble(3)).min, rs.map(_.getDouble(3)).max)
    }
    SdvAgg.weightedAverage(d).collect().foreach { r =>
      val (lo, hi) = bounds(r.getString(0))
      assert(r.getDouble(1) >= lo - 1e-9 && r.getDouble(1) <= hi + 1e-9,
        s"WTA ${r.getDouble(1)} outside [$lo,$hi] for ${r.getString(0)}")
    }
  }

  test("property: DCD normalized pct is in (0,100] and rating is an input rating") {
    val rows = randomRatingTable(50, 6)
    val d = df(numSchema, rows)
    val inputs = rows.groupBy(_.getString(0))
      .map { case (m, rs) => m -> rs.map(_.getDouble(3)).toSet }
    SdvAgg.dominantCondition(d).collect().foreach { r =>
      assert(r.getDouble(2) > 0 && r.getDouble(2) <= 100 + 1e-9)
      assert(inputs(r.getString(0)).contains(r.getDouble(1)))
    }
  }

  test("property: dominant component rating is an input rating with max comppct") {
    val rows = randomRatingTable(40, 5)
    val d = df(numSchema, rows)
    val byMu = rows.groupBy(_.getString(0))
    SdvAgg.dominantComponent(d).collect().foreach { r =>
      val rs = byMu(r.getString(0))
      assert(r.getDouble(2) === rs.map(_.getDouble(2)).max)
    }
  }

  test("property: slice thickness never exceeds the slice width") {
    val hzSchema = StructType(Seq(
      StructField("mukey", StringType), StructField("cokey", LongType),
      StructField("comppct", DoubleType), StructField("hzdept", DoubleType),
      StructField("hzdepb", DoubleType), StructField("rating", DoubleType)))
    // tiling horizons 0..200 in random steps
    val rows = (1 to 30).flatMap { m =>
      var top = 0
      (1 to 5).map { h =>
        val bot = top + 10 + rnd.nextInt(50)
        val r = Row(s"m$m", (m * 10 + 1).toLong, 80.0,
          top.toDouble, bot.toDouble, rnd.nextInt(10).toDouble)
        top = bot
        r
      }
    }
    val d = df(hzSchema, rows)
    SdvAgg.hzWtaSum(d, 0, 100).collect().foreach { r =>
      val tk = r.getDouble(2)
      assert(tk <= 100 + 1e-9, s"thickness $tk > slice width")
    }
  }

  test("distributionDrift: zero on identical vintages, positive under a shift, totals exact") {
    val s = StructType(Seq(StructField("v", LongType)))
    val vals = (0 until 400).map(i => Row((rnd.nextInt(56) * 1000 + 17).toLong))
    val a = df(s, vals)
    val same = graft.validate.Validate.distributionDrift(a, a, "v", 2000L, 27)
      .collect()
    assert(same.nonEmpty)
    // identical histograms ⇒ every contribution and the total are 0
    assert(same.forall(r => r.getLong(3) == 0L && r.getLong(4) == 0L))
    val shifted = a.select((col("v") * 2L).as("v"))
    val drift = graft.validate.Validate.distributionDrift(a, shifted, "v", 2000L, 27)
      .collect()
    val total = drift.head.getLong(4)
    assert(total > 0L, "planted shift must register")
    // drift_nano is the same exact total on every row and equals the
    // sum of the per-bucket integer contributions (order-independent)
    assert(drift.forall(_.getLong(4) == total))
    assert(drift.map(_.getLong(3)).sum == total)
  }
}
