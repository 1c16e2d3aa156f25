package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Union of all query groups exposed through SparkEntry. */
object Registry {
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ ExtensionQueries.queries

  def oracle: Map[String, String] =
    ParityQueries.oracle ++ ExtensionQueries.oracle
}
