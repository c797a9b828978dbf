package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 is declared in a
  * `graft.queries.*Queries` group as a [[QueryDef]] (Spark query +
  * optional DuckDB oracle SQL); this object just aggregates them.
  */
object SparkEntry {

  /** All operator groups, in SURVEY §2 order. */
  def groups: Seq[Seq[QueryDef]] = Seq(
    CoreQueries.defs,
    AggQueries.defs,
    SortQueries.defs,
    JoinQueries.defs,
    TextQueries.defs,
    VectorQueries.defs,
    OpsQueries.defs,
    CorpusQueries.defs,
    PrepQueries.defs,
    PipelineQueries.defs,
    GeoQueries.defs,
    CurationQueries.defs,
    GovernanceQueries.defs,
    AuditQueries.defs,
    BehaviorQueries.defs
  )

  private lazy val all: Seq[QueryDef] = {
    val ds = groups.flatten
    val dup = ds.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    ds
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    all.head.run(spark, dir)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
