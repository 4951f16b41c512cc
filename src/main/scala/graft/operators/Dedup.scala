package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Row-dedup semantics from the reference (SURVEY §2.6, §7.4.1).
  *
  * The reference has three conflicting rules:
  *  - keep last-written (net effect oldest fetch): `api/api_handler.py:418-425`
  *  - keep first-seen: `api/api_handler_csv.py:169-184`
  *  - latest-file-only: `etl/lightweight_etl.py:243-248`
  * Engine contract (documented decision): the survivor of a duplicate
  * key is the row with the greatest `version` ordering (for OHLCV: max
  * `fetch_timestamp`), matching the *intent* of latest-file-only and the
  * data reality in `infra/reliance.csv.gz`.
  *
  * Scale notes: row_number over (keys → version desc) is one shuffle +
  * per-partition sort on the dedup keys — the standard Spark idiom; AQE
  * handles skewed keys. `keepFirst` is the same plan ascending.
  */
object Dedup {

  /** Keep the row with the greatest `version` per key (engine contract). */
  def keepLatest(df: DataFrame, keys: Seq[Column], version: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(version.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Keep the row with the least `version` per key
    * (api_handler_csv.py:169-184 behavior, exposed for parity). */
  def keepFirst(df: DataFrame, keys: Seq[Column], version: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(version.map(_.asc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
