package graft.io

/** S4 — the Web Soil Survey landing-zone layout
  * (SSURGO_BatchDownload.py:387-580). The HTTP fetch itself is
  * out-of-band (zero-egress here and an operational concern at scale);
  * the engine's contract is the landed per-survey folder naming, which
  * this models: wss_SSA_<areasymbol>_[YYYY-MM-DD].zip → survey folder
  * soil_<areasymbol-lowercase> with tabular/ + spatial/ subfolders
  * (URL :402, naming :427). */
object WssLayout {

  private val ZipName = """wss_SSA_([A-Z]{2}\d{3})_\[(\d{4}-\d{2}-\d{2})\]\.zip""".r

  /** Parse a landed WSS zip name → (areasymbol, saverest date). */
  def parseZipName(name: String): Option[(String, String)] = name match {
    case ZipName(area, date) => Some((area, date))
    case _ => None
  }

  def surveyFolder(areasymbol: String): String =
    s"soil_${areasymbol.toLowerCase}"

  def tabularPath(root: String, areasymbol: String, table: String): String =
    s"$root/${surveyFolder(areasymbol)}/tabular/$table.txt"

  /** S2 — metadata (mdstat*) text files: WSS tabular short name →
    * physical table name (ImportMDTabular,
    * SSURGO_Convert_to_Geodatabase.py:846-849). */
  val metadataFiles: Map[String, String] = Map(
    "mstabcol" -> "mdstattabcols", "msrsdet" -> "mdstatrshipdet",
    "mstab" -> "mdstattabs", "msrsmas" -> "mdstatrshipmas",
    "msdommas" -> "mdstatdommas", "msidxmas" -> "mdstatidxmas",
    "msidxdet" -> "mdstatidxdet", "msdomdet" -> "mdstatdomdet")
}
