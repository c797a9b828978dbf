package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.meta.{GeoColumnMeta, GeoMeta}
import graft.table.GeoTable

/** BigQuery source (reference `core/extract_bigquery.py`): extract a
  * BigQuery table — GEOGRAPHY columns converted to WKB, `edges:
  * "spherical"` in the resulting metadata — with injection-safe table-id
  * validation (`extract_bigquery.py:28-135`), geometry-column detection
  * (`:395-458`), server-vs-local bbox strategy by row-count threshold
  * (`:591-623`), WHERE passthrough and limit (`:863-909`).
  *
  * The wire layer is a pluggable [[Transport]], the [[ArcGis.Fetcher]]
  * convention: the reference reads through a DuckDB BigQuery extension;
  * a Spark deployment would back this with the public Spark-BigQuery
  * connector (not present in this zero-egress image), and tests inject
  * a local fake — every decision this module makes (validation,
  * detection, strategy, filter composition, metadata) is exercised
  * without a network.
  */
object BigQuery {

  /** GCP project ids: 6-30 chars, lowercase letter start, lowercase
    * letters / digits / hyphens (`extract_bigquery.py:27-29`).
    */
  private val ProjectIdPattern = "^[a-z][a-z0-9\\-]{5,29}$".r
  private val TablePartPattern = "^[a-zA-Z0-9_\\-]+$".r

  def validateProjectId(project: String): String = {
    require(ProjectIdPattern.matches(project),
      s"Invalid GCP project ID: '$project'. Project IDs must be 6-30 " +
        "characters, start with a lowercase letter, and contain only " +
        "lowercase letters, digits, and hyphens.")
    project
  }

  private def validatePart(part: String, name: String): String = {
    require(TablePartPattern.matches(part),
      s"Invalid BigQuery $name: '$part'. Must contain only alphanumeric " +
        "characters, underscores, and hyphens.")
    part
  }

  /** `dataset.table` (+ project param) or `project.dataset.table` →
    * fully-qualified validated id; explicit project overrides
    * (`extract_bigquery.py:79-135`).
    */
  def normalizeTableId(tableId: String, project: Option[String] = None): String =
    tableId.split("\\.").toSeq match {
      case Seq(p, d, t) =>
        validatePart(p, "project"); validatePart(d, "dataset")
        validatePart(t, "table")
        project.map(pp => s"${validateProjectId(pp)}.$d.$t").getOrElse(tableId)
      case Seq(d, t) =>
        validatePart(d, "dataset"); validatePart(t, "table")
        val p = project.getOrElse(throw new IllegalArgumentException(
          s"Table ID '$tableId' uses dataset.table format but no project " +
            "was specified. Either use project.dataset.table format or " +
            "provide a project."))
        s"${validateProjectId(p)}.$d.$t"
      case _ => throw new IllegalArgumentException(
        s"Invalid table ID '$tableId': expected dataset.table or " +
          "project.dataset.table")
    }

  final case class Query(
      columns: Option[Seq[String]] = None,
      geographyColumn: Option[String] = None,
      bbox: Option[(Double, Double, Double, Double)] = None,
      /** "auto" | "server" | "local" (reference `--bbox-mode`). */
      bboxMode: String = "auto",
      /** auto mode: tables at/above this row count filter server-side. */
      bboxThreshold: Long = 1000000L,
      where: Option[String] = None,
      limit: Option[Int] = None)

  /** The pluggable wire layer. `scan` must return GEOGRAPHY columns as
    * WKB binary (the reference's ST_AsWKB contract); `serverFilter` is
    * the BigQuery-side predicate when the strategy chose server-side.
    */
  trait Transport {
    /** (column name, upper-case type name) pairs, schema order. */
    def schema(tableId: String): Seq[(String, String)]
    /** Row count for the auto bbox strategy; None = unknown. */
    def rowCount(tableId: String): Option[Long]
    def scan(spark: SparkSession, tableId: String, select: Seq[String],
        serverFilter: Option[String]): DataFrame
  }

  /** Geometry-column detection (`extract_bigquery.py:395-458`): an
    * explicit name validates (case-insensitively) or fails loudly;
    * otherwise the first GEOGRAPHY/GEOMETRY-typed column; otherwise the
    * reference's common-name fallback list.
    */
  def detectGeometryColumn(schema: Seq[(String, String)],
      explicit: Option[String], tableId: String): Option[String] = {
    val all = schema.map(_._1)
    val typed = schema.filter { case (_, t) =>
      t.toUpperCase.contains("GEOMETRY") || t.toUpperCase.contains("GEOGRAPHY")
    }.map(_._1)
    explicit match {
      case Some(name) =>
        all.find(_ == name)
          .orElse(all.find(_.equalsIgnoreCase(name)))
          .orElse(throw new IllegalArgumentException(
            s"Geography column '$name' not found in table '$tableId'. " +
              s"Available columns: $all." +
              (if (typed.nonEmpty) s" Detected geometry columns: $typed." else "")))
          .map(identity)
      case None =>
        typed.headOption.orElse {
          val lower = all.map(c => c.toLowerCase -> c).toMap
          Seq("geometry", "geom", "the_geom", "shape", "geo", "geography")
            .collectFirst { case n if lower.contains(n) => lower(n) }
        }
    }
  }

  /** Server-vs-local bbox strategy (`extract_bigquery.py:591-623`):
    * forced modes win; auto compares the row count to the threshold and
    * falls back to local when the count is unknown.
    */
  def useServerBbox(mode: String, rowCount: Option[Long],
      threshold: Long): Boolean = mode match {
    case "server" => true
    case "local"  => false
    case "auto"   => rowCount.exists(_ >= threshold)
    case other => throw new IllegalArgumentException(
      s"bbox mode must be auto|server|local, got '$other'")
  }

  /** The BigQuery-side spatial predicate for server-side filtering
    * (`extract_bigquery.py:626-653`).
    */
  def serverBboxFilter(geomCol: String,
      bbox: (Double, Double, Double, Double)): String = {
    val (x0, y0, x1, y1) = bbox
    val wkt = s"POLYGON(($x0 $y0, $x1 $y0, $x1 $y1, $x0 $y1, $x0 $y0))"
    s"ST_INTERSECTS($geomCol, ST_GEOGFROMTEXT('$wkt'))"
  }

  /** Full source: schema probe → geometry detection → column selection
    * (geometry force-included, `extract_bigquery.py:375-380`) → one
    * transport scan with the server-side predicate when chosen → local
    * bbox / WHERE / limit on the Spark side → GeoTable with
    * `edges: "spherical"` metadata when a GEOGRAPHY column is present
    * (`extract_bigquery.py:855`).
    */
  def read(spark: SparkSession, tableId: String,
      project: Option[String] = None, q: Query = Query(),
      transport: Transport): GeoTable = {
    val tid = normalizeTableId(tableId, project)
    val schema = transport.schema(tid)
    require(schema.nonEmpty, s"table $tid has no columns")
    val geom = detectGeometryColumn(schema, q.geographyColumn, tid)
    val cols = q.columns match {
      case Some(cs) =>
        // unknown requested columns fail loudly (a typo'd name used to
        // be silently dropped, returning a table missing the data the
        // caller asked for) — same contract as the explicit
        // geography-column path above
        val known = schema.map(_._1).toSet
        val missing = cs.filterNot(known.contains)
        require(missing.isEmpty,
          s"columns not in $tid: ${missing.mkString(", ")} " +
            s"(table has: ${schema.map(_._1).mkString(", ")})")
        geom.filterNot(cs.contains).map(cs :+ _).getOrElse(cs)
      case None => schema.map(_._1)
    }
    val (serverFilter, localBbox) = (q.bbox, geom) match {
      case (Some(b), Some(g)) =>
        if (useServerBbox(q.bboxMode, transport.rowCount(tid), q.bboxThreshold))
          (Some(serverBboxFilter(g, b)), None)
        else (None, Some(b))
      case (Some(_), None) => (None, None) // reference warns and ignores
      case _ => (None, None)
    }
    var df = transport.scan(spark, tid, cols, serverFilter)
    q.where.foreach(w => df = df.filter(expr(w)))
    val t = geom match {
      case Some(g) =>
        val base = GeoTable(df,
          GeoMeta(primaryColumn = g,
            columns = Map(g -> GeoColumnMeta(edges = Some("spherical")))),
          Some(g))
        localBbox.map { case (x0, y0, x1, y1) =>
          base.filterBbox(x0, y0, x1, y1)
        }.getOrElse(base)
      case None => GeoTable(df, GeoMeta(primaryColumn = "", columns = Map()), None)
    }
    // LIMIT applies after the bbox filter in BOTH strategies: server
    // mode filters inside the scan, so local mode must filter before
    // limiting too — otherwise the auto row-count threshold silently
    // changes how many matching rows a bbox+limit query returns
    q.limit.map(t.limit).getOrElse(t)
  }
}
