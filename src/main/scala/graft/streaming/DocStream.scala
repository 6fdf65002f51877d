package graft.streaming

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming document ingest — the streaming face of the batch ingest gate
  * (`Dedup.dropDupesAgainst`): documents arrive continuously, exact
  * duplicates of the historical corpus AND re-sends within the stream are
  * dropped before the sink.
  *
  * Scale design: the corpus side collapses to DISTINCT 64-bit text
  * fingerprints (8 bytes per historical doc — persist/bucket this table
  * between ingests) and the membership probe is a STATELESS stream-static
  * join evaluated per micro-batch; only the within-stream dedup keeps
  * state, keyed by fingerprint and bounded by the watermark horizon, so
  * state is O(docs-in-horizon), independent of corpus size and stream
  * length.
  */
object DocStream {

  /** `docs` is a STREAMING DataFrame with `tsCol` event time and `textCol`;
    * `corpus` is a static DataFrame of already-ingested documents. Emits
    * the surviving stream rows (original columns).
    *
    * The corpus probe is a left-outer join + null filter rather than a
    * left-anti join: stream-static anti joins are not in Structured
    * Streaming's supported-join matrix, the outer+filter form is
    * ("stateless per micro-batch"), and the two are row-equivalent here
    * because the corpus side is distinct fingerprints (no duplication on
    * match).
    */
  def dedupedIngest(docs: DataFrame, corpus: DataFrame,
                    textCol: String = "text", tsCol: String = "ts",
                    watermark: String = "10 minutes"): DataFrame = {
    val fps = corpus
      .select(TextFunctions.fingerprint64(col(textCol)).as("__fp"))
      .distinct()
      .withColumn("__seen", lit(1))
    docs
      .withColumn("__fp", TextFunctions.fingerprint64(col(textCol)))
      .withWatermark(tsCol, watermark)
      .join(fps, Seq("__fp"), "left_outer")
      .filter(col("__seen").isNull)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp", "__seen")
  }
}
