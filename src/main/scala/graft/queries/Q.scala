package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle
  * query over the same parquet tables. Queries without an oracle get
  * the driver's weaker rows-only check.
  *
  * Oracle-parity rules (so the driver's column-sorted value hash
  * matches exactly):
  *  - identical column names on both sides (alias every computed col);
  *  - deterministic total row order on both sides (ORDER BY with a
  *    unique tiebreak);
  *  - monetary aggregates computed in DECIMAL then cast to DOUBLE
  *    (bitwise-identical across engines; double-sum order is not);
  *  - ratios built as int/int divisions in DOUBLE (exact both sides).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
