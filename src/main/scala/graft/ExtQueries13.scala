package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.Tables

/**
 * Round-6 third wave: training-example generation (sliding context
 * windows over user histories), curriculum interleaving, and streaming
 * materialized-view merge maintenance.
 */
object ExtQueries13 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Next-item training examples: for every event with >= 3 predecessors,
    // the previous 3 event types (in time order) as context and the
    // current type as label — the sliding-window dataset generator behind
    // sequence models. One shuffle (user partition); the window frame is
    // 3 rows, so state per row is constant whatever the history length.
    "sequence_examples" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("context", collect_list(col("event_type"))
          .over(w.rowsBetween(-3, -1)))
        .withColumn("pos", row_number().over(w))
        .where(col("pos") >= 4)
        .select(col("user_id"), col("event_id"), col("pos").cast("long").as("pos"),
          // joined string, not array: the gate's canonicalizer (like the
          // driver's) hashes scalar cells
          array_join(col("context"), "|").as("context"), col("event_type").as("label"))
        .orderBy(col("user_id"), col("pos"))
    }),

    // Curriculum interleave: difficulty bucket from a pure function of
    // the quality score (no global ntile — a single-partition sort at
    // corpus scale), rank within bucket (partitioned window, parallel),
    // and the round-robin curriculum position rank*10 + bucket so each
    // "epoch slice" sees every difficulty level. Unique by construction.
    "curriculum_order" -> ((s, dir) => {
      val ws = split(col("text"), " ")
      val score = size(array_distinct(ws)).cast("double") / size(ws)
      val bucket = least(lit(9), floor(score * 10)).cast("int")
      // rank over the RAW score — rounding the ordering key would
      // reorder near-ties differently than the oracle
      val inBucket = Window.partitionBy(col("bucket"))
        .orderBy(col("raw"), col("doc_id"))
      Tables.table(s, dir, "documents")
        .select(col("doc_id"), score.as("raw"), bucket.as("bucket"))
        .withColumn("rank_in_bucket", row_number().over(inBucket).cast("long"))
        .select(col("doc_id"), round(col("raw"), 6).as("score"), col("bucket"),
          col("rank_in_bucket"),
          (col("rank_in_bucket") * 10 + col("bucket")).as("curriculum_pos"))
        .orderBy(col("curriculum_pos"))
    }),

    // Streaming MV merge maintenance: each microbatch's partial aggregate
    // merges into the standing view (union + re-aggregate over keyed
    // partials — never a rescan of prior batches), the foreachBatch form
    // of warehouse upsert maintenance. Decimal sums make the merge
    // bit-equal to the batch recompute the oracle runs. maxFilesPerTrigger
    // keeps multi-file inputs arriving as genuinely separate batches.
    "stream_mv_merge" -> ((s, dir) => {
      // sum() widens decimal precision — cast back so every merge round
      // unions against the standing view's exact schema
      def partial(df: DataFrame) = df
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(20, 4))).cast(DecimalType(20, 4)).as("total"))
      var mv = s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("event_type",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("total", DecimalType(20, 4)))))
      val q = graft.streaming.StreamingOps.eventsStream(s, dir)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          mv = mv.unionAll(partial(batch))
            .groupBy(col("event_type"))
            .agg(sum(col("n")).as("n"),
              sum(col("total")).cast(DecimalType(20, 4)).as("total"))
            .localCheckpoint(true) // bound lineage across batches
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      mv.select(col("event_type"), col("n"),
          col("total").cast("double").as("total"))
        .orderBy(col("event_type"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "sequence_examples" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         array_agg(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS context,
        |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos
        |  FROM events)
        |SELECT user_id, event_id, CAST(pos AS BIGINT) AS pos,
        |       array_to_string(context, '|') AS context, event_type AS label
        |FROM e WHERE pos >= 4 ORDER BY user_id, pos""".stripMargin,

    "curriculum_order" ->
      """WITH b AS (
        |  SELECT doc_id,
        |         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |           / len(string_split(text, ' ')) AS raw_score
        |  FROM documents),
        |c AS (SELECT doc_id, raw_score,
        |             CAST(least(9, floor(raw_score * 10)) AS INT) AS bucket
        |      FROM b)
        |SELECT doc_id, round(raw_score, 6) AS score, bucket,
        |       CAST(ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY raw_score, doc_id) AS BIGINT)
        |         AS rank_in_bucket,
        |       CAST(ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY raw_score, doc_id) * 10
        |            + bucket AS BIGINT) AS curriculum_pos
        |FROM c ORDER BY curriculum_pos""".stripMargin,

    "stream_mv_merge" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS total
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
