package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Real geometry arithmetic for the spatial operators the reference
  * runs through arcpy (gSSURGO_Clip.py:63-336 Clip_analysis;
  * SSURGO_ExportMuRaster.py:1252-1357 PolygonToRaster cell lookup) —
  * previously modeled key-relationally (J16/S7, SURVEY §1.5). The
  * subset implemented here is the integer-exact core that IS
  * engine-portable: axis-aligned clip, shoelace polygon area, and
  * ray-casting point-in-polygon, all in pure column arithmetic.
  *
  * Scale shape: every function is per-row expression work (no UDF, no
  * shuffle, no driver loop) — the per-row cost is O(vertices). A full
  * distributed spatial JOIN composes these with a grid-cell bucket
  * join: bboxClip against grid cells is the candidate generator (the
  * same blocked-candidates shape as the LSH dedup family), and the
  * exact predicate (pointInPolygon / clip area > 0) verifies
  * bucket-mates — never a geometry cross join.
  *
  * Integer contract: coordinates are BIGINT (a fixed-point grid — the
  * raster cell space of SSURGO_ExportMuRaster). All predicates reduce
  * to integer multiply/compare, so Spark and any ANSI engine agree
  * bit-for-bit; nothing here rounds. */
object Geo {

  /** Clipped box of (x0,y0,x1,y1) against (a0,b0,a1,b1) as a struct
    * (ix0, iy0, ix1, iy1, area); empty intersections have area 0 and
    * ix/iy columns NULL. Boxes are half-open [x0,x1)×[y0,y1): touching
    * edges do not intersect (area would be 0). */
  def bboxClip(x0: Column, y0: Column, x1: Column, y1: Column,
      a0: Long, b0: Long, a1: Long, b1: Long): Column = {
    val ix0 = greatest(x0, lit(a0)); val iy0 = greatest(y0, lit(b0))
    val ix1 = least(x1, lit(a1));    val iy1 = least(y1, lit(b1))
    val hit = ix1 > ix0 && iy1 > iy0
    struct(
      when(hit, ix0).as("ix0"), when(hit, iy0).as("iy0"),
      when(hit, ix1).as("ix1"), when(hit, iy1).as("iy1"),
      when(hit, (ix1 - ix0) * (iy1 - iy0)).otherwise(lit(0L)).as("area"))
  }

  /** Twice the absolute shoelace area of the polygon whose vertices
    * are parallel BIGINT arrays xs/ys (closed implicitly: vertex n
    * connects back to vertex 1). Doubled to stay integer-exact for
    * odd areas; callers wanting float area divide at the edge. */
  def polygonArea2(xs: Column, ys: Column): Column = {
    val n = size(xs)
    abs(aggregate(sequence(lit(1), n), lit(0L), (acc, i) => {
      val j = (i % n) + 1
      acc + element_at(xs, i) * element_at(ys, j) -
        element_at(xs, j) * element_at(ys, i)
    }))
  }

  /** Ray-casting point-in-polygon over parallel BIGINT vertex arrays:
    * casts the +x ray from (px,py) and counts edge crossings with the
    * standard half-open rule ((y1<=py) != (y2<=py)) and the integer
    * cross-product side test — no division, no floats, so the
    * boundary convention is identical in every engine that evaluates
    * the same arithmetic. Points exactly on an edge line (t = 0) are
    * NOT counted as crossings (consistently, both engines).
    *
    * PERFORMANCE: this higher-order form is CodegenFallback —
    * interpreted per row. Fine for per-polygon probes (s11's 3/row);
    * for cell-fan hot paths (millions of tests, the s12 zonal shape)
    * use the native codegen expression
    * org.apache.spark.sql.graft.PointInPolygon (≈20× faster,
    * GeoSpec pins the equivalence; NULL on malformed vertices where
    * this form emits a garbage verdict). */
  def pointInPolygon(px: Column, py: Column, xs: Column, ys: Column): Column = {
    val n = size(xs)
    val crossings = aggregate(sequence(lit(1), n), lit(0L), (acc, i) => {
      val j = (i % n) + 1
      val x1 = element_at(xs, i); val y1 = element_at(ys, i)
      val x2 = element_at(xs, j); val y2 = element_at(ys, j)
      val straddles = (y1 <= py) =!= (y2 <= py)
      // ray hits right of (px,py): sign((x1-px)(y2-y1) + (x2-x1)(py-y1))
      // must equal sign(y2-y1)
      val t = (x1 - px) * (y2 - y1) + (x2 - x1) * (py - y1)
      acc + when(straddles && ((t > 0) === (y2 > y1)) && t =!= 0, 1L)
        .otherwise(0L)
    })
    crossings % 2 === 1
  }

  /** Sutherland–Hodgman clip of the polygon (parallel BIGINT vertex
    * arrays xs/ys, implicitly closed) against the axis-aligned AOI
    * rectangle [a0,a1]×[b0,b1] (closed: boundary vertices are inside) —
    * the polygon-level Clip_analysis the reference runs through arcpy
    * (gSSURGO_Clip.py:63-336; the clipped ring feeds acreage via
    * [[polygonArea2]], mirroring gSSURGO_Clip.py:318-326). Returns
    * struct(xs, ys) of the clipped ring; fully-outside polygons yield
    * empty arrays.
    *
    * One `aggregate` fold over the four clip half-planes, each pass
    * the standard per-edge emission (entering edge → intersection +
    * vertex, leaving edge → intersection, inside edge → vertex) built
    * from pure array expressions — per-row O(4·vertices) work, no
    * shuffle, no UDF. The expression is written once and iterated, so
    * the plan never inlines pass N into pass N+1 (the s12
    * expression-blowup cliff).
    *
    * Exactness contract: intersection vertices are computed with an
    * exact integer division — they are bit-exact across engines when
    * they land on the coordinate grid (true whenever every edge slope
    * is ±1 or axis-parallel, as in the gated fixtures; general slopes
    * need the caller to pre-scale coordinates by the slope
    * denominators, the usual fixed-point doubling). Duplicate output
    * vertices can appear when a vertex lies exactly on a clip line —
    * harmless to the shoelace (zero-area contribution). Subject
    * polygons should be convex or simple; for concave subjects
    * Sutherland–Hodgman may emit zero-area bridge edges (standard
    * behavior, area still correct). */
  def clipPolygonAoi(xs: Column, ys: Column,
      a0: Long, b0: Long, a1: Long, b1: Long): Column = {
    // half-planes in fixed order (x≥a0, x≤a1, y≥b0, y≤b1) — the pass
    // order is part of the contract (intermediate rings depend on it)
    // and the SQL oracle replays the identical order
    val planes = array(
      struct(lit(true).as("isx"), lit(-1L).as("sgn"), lit(a0).as("c")),
      struct(lit(true).as("isx"), lit(1L).as("sgn"), lit(a1).as("c")),
      struct(lit(false).as("isx"), lit(-1L).as("sgn"), lit(b0).as("c")),
      struct(lit(false).as("isx"), lit(1L).as("sgn"), lit(b1).as("c")))
    aggregate(planes, struct(xs.as("xs"), ys.as("ys")), (acc, p) => {
      val axs = acc.getField("xs"); val ays = acc.getField("ys")
      val n = size(axs)
      val isx = p.getField("isx"); val sgn = p.getField("sgn")
      val c = p.getField("c")
      def prevI(i: Column) = when(i === 1, n).otherwise(i - 1)
      def xAt(i: Column) = element_at(axs, i)
      def yAt(i: Column) = element_at(ays, i)
      def inside(i: Column) =
        sgn * when(isx, xAt(i)).otherwise(yAt(i)) <= sgn * c
      // intersection of edge prev→cur with the clip line; the guard
      // (inside(cur) != inside(prev)) makes the denominator nonzero,
      // and the exactness contract makes the division exact (so the
      // double round-trip is lossless)
      def interX(i: Column) = {
        val pi = prevI(i)
        when(isx, c).otherwise(
          xAt(pi) + ((xAt(i) - xAt(pi)) * (c - yAt(pi))).cast("double")
            ./((yAt(i) - yAt(pi)).cast("double")).cast("long"))
      }
      def interY(i: Column) = {
        val pi = prevI(i)
        when(isx,
          yAt(pi) + ((yAt(i) - yAt(pi)) * (c - xAt(pi))).cast("double")
            ./((xAt(i) - xAt(pi)).cast("double")).cast("long"))
          .otherwise(c)
      }
      def pass(coordAt: Column => Column, inter: Column => Column) =
        filter(
          flatten(transform(sequence(lit(1), n), i => array(
            when(inside(i) =!= inside(prevI(i)), inter(i)),
            when(inside(i), coordAt(i))))),
          v => v.isNotNull)
      // n == 0 guard: sequence(1, 0) would auto-step DOWN — an empty
      // ring stays empty through every remaining pass
      when(n === 0, acc)
        .otherwise(struct(pass(xAt, interX).as("xs"), pass(yAt, interY).as("ys")))
    })
  }
}
