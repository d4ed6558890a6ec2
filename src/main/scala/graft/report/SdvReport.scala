package graft.report

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** R4 — SDV_AttributeReport / gSSURGO_TabularReport
  * (SDV_AttributeReport.py:65-251, gSSURGO_TabularReport.py:63-310):
  * the reference renders a rating table through fixed .rlf report
  * layouts. The analytic core is just "rating table ⟕ mapunit, fixed
  * column order, fixed formatting"; this renders the same golden form as
  * text. Driver-side only (a formatting layer — collect() is bounded by
  * the mapunit count of the report, as in the reference). */
object SdvReport {

  def render(rating: DataFrame, title: String, maxRows: Int = 50): String = {
    val cols = rating.columns.toSeq
    val rows = rating.limit(maxRows).collect()
      .map(_.toSeq.map(v => if (v == null) "--" else v.toString))
    val widths = cols.indices.map(i =>
      (cols(i).length +: rows.map(_(i).length)).max)
    def line(vals: Seq[String]) =
      vals.zip(widths).map { case (v, w) => v.padTo(w, ' ') }.mkString("| ", " | ", " |")
    val sep = widths.map("-" * _).mkString("+-", "-+-", "-+")
    (Seq(title, sep, line(cols), sep) ++ rows.map(line) :+ sep).mkString("\n")
  }

  /** Distributed body renderer — the scale path for R4: one text line
    * per rating row, in the same golden form as render()'s body. Column
    * widths come from a one-row aggregate broadcast back onto the data
    * (no collect, no global window), so the formatting pass survives a
    * report of any size; `key` carries the report's sort order for the
    * consumer. All `cols` must already be string-typed; nulls render
    * as render()'s `--`. */
  def renderLines(df: DataFrame, key: String, cols: Seq[String]): DataFrame = {
    val aggs = cols.map { c =>
      greatest(lit(c.length), lit(2),
        max(length(coalesce(col(c), lit("--"))))).as(s"__w_$c")
    }
    val widths = df.agg(aggs.head, aggs.tail: _*)
    val body = cols.map(c => s"rpad(coalesce($c, '--'), __w_$c, ' ')")
      .mkString("concat('| ', ", ", ' | ', ", ", ' |')")
    df.crossJoin(broadcast(widths)).select(col(key), expr(body).as("line"))
  }
}
