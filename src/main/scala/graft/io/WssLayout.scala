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

  /** The WSS download artifact name for a survey area + saverest date
    * (SSURGO_BatchDownload.py:402). */
  def zipName(areasymbol: String, date: String): String =
    s"wss_SSA_${areasymbol}_[$date].zip"

  /** Land one WSS download: zip bytes → the per-survey folder layout
    * under `root` (unzip + rename to soil_<ssa>,
    * SSURGO_BatchDownload.py:427-480). The zip's own top-level folder
    * (the SSA name in real downloads) is stripped and replaced by the
    * soil_<ssa> folder — the reference's os.rename. The byte source is
    * injected (canned bytes here, an HTTP GET of the :402 URL in
    * production — zero-egress sandbox), so the whole unzip → layout →
    * import chain is testable offline. Entries containing `..` are
    * rejected (zip-slip). Returns the landed survey folder. */
  def landZip(conf: org.apache.hadoop.conf.Configuration, root: String,
      zipName: String, bytes: Array[Byte]): String = {
    val area = parseZipName(zipName).map(_._1).getOrElse(
      throw new IllegalArgumentException(s"not a WSS zip name: $zipName"))
    val dest = s"$root/${surveyFolder(area)}"
    val fs = new org.apache.hadoop.fs.Path(dest).getFileSystem(conf)
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) {
        val parts = e.getName.split("/").filter(_.nonEmpty).toSeq
        require(!parts.contains(".."), s"zip-slip path in entry: ${e.getName}")
        val rel = (if (parts.length > 1 &&
            (parts.head.equalsIgnoreCase(area) || parts.head.startsWith("soil_")))
          parts.tail else parts).mkString("/")
        val out = fs.create(new org.apache.hadoop.fs.Path(dest, rel), true)
        val buf = new Array[Byte](8192)
        var n = zin.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = zin.read(buf) }
        out.close()
      }
      e = zin.getNextEntry
    }
    zin.close()
    dest
  }

  /** S2 — metadata (mdstat*) text files: WSS tabular short name →
    * physical table name (ImportMDTabular,
    * SSURGO_Convert_to_Geodatabase.py:846-849). */
  val metadataFiles: Map[String, String] = Map(
    "mstabcol" -> "mdstattabcols", "msrsdet" -> "mdstatrshipdet",
    "mstab" -> "mdstattabs", "msrsmas" -> "mdstatrshipmas",
    "msdommas" -> "mdstatdommas", "msidxmas" -> "mdstatidxmas",
    "msidxdet" -> "mdstatidxdet", "msdomdet" -> "mdstatdomdet")
}
