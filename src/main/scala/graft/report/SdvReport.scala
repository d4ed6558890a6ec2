package graft.report

import org.apache.spark.sql.DataFrame

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
}
