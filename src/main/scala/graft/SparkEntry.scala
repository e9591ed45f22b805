package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Graft.Q
import graft.operators.{CleanQueries, CohortQueries, CoreQueries, CorpusQueries, CorrelatedQueries, ExtendedQueries, FrontierQueries, IndicatorQueries, LedgerQueries, MarketQueries, OpsQueries, PatternQueries, QualityQueries, RetrievalQueries, SegmentQueries, SimilarityQueries, StatQueries, StreamQueries, TextQueries, TpchQueries, TrainPrepQueries, TsQueries, VectorQueries, WarehouseQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of every module's operator queries; each key has a
  * matching DuckDB oracle in `oracleSql` unless the op is not
  * SQL-expressible (then the driver records a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's §7.2 minimum slice: the full risk-classification
    * pipeline (log returns → annualized vol → percentiles → classes+rank). */
  def entry(spark: SparkSession): DataFrame =
    TsQueries.a6RiskClassify(spark, "/root/testdata/sf0.001")

  private def modules: Seq[(Map[String, Q], Map[String, String])] = Seq(
    (CoreQueries.queries, CoreQueries.oracle),
    (ExtendedQueries.queries, ExtendedQueries.oracle),
    (CorrelatedQueries.queries, CorrelatedQueries.oracle),
    (TpchQueries.queries, TpchQueries.oracle),
    (OpsQueries.queries, OpsQueries.oracle),
    (SegmentQueries.queries, SegmentQueries.oracle),
    (TrainPrepQueries.queries, TrainPrepQueries.oracle),
    (TsQueries.queries, TsQueries.oracle),
    (IndicatorQueries.queries, IndicatorQueries.oracle),
    (MarketQueries.queries, MarketQueries.oracle),
    (CorpusQueries.queries, CorpusQueries.oracle),
    (RetrievalQueries.queries, RetrievalQueries.oracle),
    (CohortQueries.queries, CohortQueries.oracle),
    (StatQueries.queries, StatQueries.oracle),
    (WarehouseQueries.queries, WarehouseQueries.oracle),
    (SimilarityQueries.queries, SimilarityQueries.oracle),
    (PatternQueries.queries, PatternQueries.oracle),
    (CleanQueries.queries, CleanQueries.oracle),
    (TextQueries.queries, TextQueries.oracle),
    (QualityQueries.queries, QualityQueries.oracle),
    (VectorQueries.queries, VectorQueries.oracle),
    (StreamQueries.queries, StreamQueries.oracle),
    (FrontierQueries.queries, FrontierQueries.oracle),
    (LedgerQueries.queries, LedgerQueries.oracle),
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check. */
  def oracleSql: Map[String, String] =
    modules.iterator.flatMap(_._2).toMap
}
