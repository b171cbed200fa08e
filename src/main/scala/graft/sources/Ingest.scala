package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ingestion surface (SURVEY.md §1.3: JSON, XML, spreadsheets; reference
  * `builtin.cljc:1528-1675`).
  *
  * JSON goes straight through `spark.read.json` (distributed, schema
  * inference = the reference's learn-schema). XML is simplified to
  * JSON-shaped text with the same rules as the reference
  * (`util.cljc:203-217`): attributes fold into the element map, tag
  * namespaces become `ns_name` keys, repeated children become arrays —
  * then schema-inferred by the JSON reader. Spreadsheets: CSV with a
  * header row (xlsx needs POI, which this build intentionally excludes).
  */
object Ingest {

  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  def readJsonString(spark: SparkSession, json: String): DataFrame = {
    import spark.implicits._
    spark.read.json(Seq(json).toDS())
  }

  /** XML document string → single-row DataFrame (inferred schema). */
  def readXmlString(spark: SparkSession, xml: String): DataFrame =
    readJsonString(spark, xmlToJson(xml))

  /** XML file → DataFrame. Whole-document parse driver-side (the
    * reference reads single documents the same way); a 100 TB corpus of
    * XML files would map this over paths with `spark.read.text` +
    * per-file parse in executors.
    */
  def readXml(spark: SparkSession, path: String): DataFrame = {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    readXmlString(spark, text)
  }

  /** XML → JSON text with the reference's simplification rules. */
  def xmlToJson(xml: String): String = {
    val root = scala.xml.XML.loadString(xml)
    s"""{${quote(tagName(root))}: ${elemToJson(root)}}"""
  }

  private def tagName(e: scala.xml.Elem): String =
    Option(e.prefix).map(p => s"${p}_${e.label}").getOrElse(e.label)

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def elemToJson(e: scala.xml.Elem): String = {
    val attrs: Seq[(String, String)] =
      e.attributes.asAttrMap.toSeq.sortBy(_._1)
        .map { case (k, v) => k -> quote(v) }
    val children = e.child.collect { case c: scala.xml.Elem => c }
    if (children.isEmpty && attrs.isEmpty) quote(e.text.trim)
    else {
      // group repeated child tags into arrays (cardinality-many)
      val grouped = children.groupBy(tagName).toSeq
        .sortBy { case (n, _) => children.indexWhere(c => tagName(c) == n) }
        .map { case (n, cs) =>
          val vals = cs.map(elemToJson)
          n -> (if (vals.size == 1) vals.head
                else vals.mkString("[", ",", "]"))
        }
      val text = e.child.collect {
        case t: scala.xml.Text if t.text.trim.nonEmpty => t.text.trim
      }
      val textField =
        if (text.nonEmpty && children.nonEmpty)
          Seq("_text" -> quote(text.mkString(" ")))
        else Nil
      (attrs ++ grouped ++ textField)
        .map { case (k, v) => s"${quote(k)}: $v" }
        .mkString("{", ",", "}")
    }
  }

  /** `$getSpreadsheet` equivalent: header-keyed tabular file. CSV is
    * native; xlsx would need POI on the classpath.
    */
  def readSpreadsheet(spark: SparkSession, path: String): DataFrame =
    if (path.endsWith(".csv"))
      spark.read.option("header", "true").option("inferSchema", "true")
        .csv(path)
    else throw new UnsupportedOperationException(
      "xlsx reading requires poi-ooxml on the classpath; this build " +
        "supports CSV spreadsheets only")

  /** `$schemaFor` (reference `builtin.cljc:1688-1692`): the inferred
    * schema of a frame as JSON (Spark's learn-schema equivalent).
    */
  def schemaFor(df: DataFrame): String = df.schema.json

  /** `$addSchema` (reference `builtin.cljc:2219-2226`): merge two
    * inferred schemas — union of fields, right side wins on type
    * conflicts (the reference overlays the known schema onto learned).
    */
  def addSchema(base: org.apache.spark.sql.types.StructType,
      overlay: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType = {
    val overlayNames = overlay.fieldNames.toSet
    org.apache.spark.sql.types.StructType(
      base.fields.filterNot(f => overlayNames.contains(f.name)).toSeq ++
        overlay.fields.toSeq)
  }

  /** `$put` equivalent: write a frame as a named parquet dataset. */
  def put(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)
}
