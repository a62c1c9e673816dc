package graft.queries

import graft.Tables
import graft.ops.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal pack: binary payload + metadata struct + partition-batched
  * featurize (decode stubbed — see Multimodal.decodeStub). Rows-only gate;
  * schema/batching invariants live in ScalaTest.
  */
object MultimodalQueries extends QueryPack {

  // q37 — full media pipeline: wrap documents as (id, meta, payload),
  // featurize per partition, join features back to metadata, project
  // metadata + first feature dims. The meta-only projection prunes the
  // payload column at the scan.
  private def q37(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.asMedia(
      Tables.load(s, dir, "documents"), idCol = "doc_id", payloadCol = "text")
    val feats = Multimodal.featurize(media)
    media.select(col("media_id"), col("meta.format").as("format"),
        col("meta.n_bytes").as("n_bytes"))
      .join(feats, Seq("media_id"))
      .select(
        col("media_id"), col("format"), col("n_bytes"),
        round(element_at(col("features"), 1).cast("double"), 9).as("f0"),
        round(element_at(col("features"), 8).cast("double"), 9).as("f7"),
        size(col("features")).as("n_features"))
      .orderBy(col("media_id").asc_nulls_first)
  }

  override def queries: Seq[Q] = Seq(
    Q("q37_multimodal_featurize", q37, None)
  )
}
