package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization (gap-based): consecutive events of one key whose
  * inter-event gap exceeds `gapSec` start a new session — the batch twin of
  * Structured Streaming's `session_window`, expressed with window functions
  * so the result is deterministic, oracle-checkable, and resumable.
  *
  * Scale shape: one shuffle on the session key (the window partition), then
  * everything is per-partition sort + scan — the canonical distributed
  * sessionization plan. Timestamps are compared at MICROsecond precision
  * (`unix_micros`), not seconds, so sub-second event bursts segment
  * identically across engines.
  */
object Sessions {

  /** One row per (key, session): session ordinal (1-based, per key in time
    * order), start/end in epoch micros, and the event count.
    */
  def sessionize(df: DataFrame, key: String = "user_id", ts: String = "ts",
                 gapSec: Long = 1800L): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts))
    // cast handles TIMESTAMP_NTZ sources (identity wall-clock under the
    // engine's UTC session timezone)
    val t = unix_micros(col(ts).cast("timestamp"))
    val prev = lag(t, 1).over(w)
    val newSession = when(prev.isNull || t - prev > gapSec * 1000000L, 1L).otherwise(0L)
    df.withColumn("__t", t)
      .withColumn("__sid", sum(newSession).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(key), col("__sid").as("sid"))
      .agg(min(col("__t")).as("session_start"),
        max(col("__t")).as("session_end"),
        count(lit(1)).as("n_events"))
  }
}
