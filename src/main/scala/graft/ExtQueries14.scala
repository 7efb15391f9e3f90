package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{Cooccurrence, Tables}

/**
 * Round-6 fourth wave: decimal-exact PageRank (iterative graph scoring
 * whose result is independent of summation order — distributed float
 * adds are not), calendar gap-fill with forward-fill (the time-series
 * resample archetype), and a point-in-time feature join (the
 * feature-store training-set assembly pattern).
 */
object ExtQueries14 {

  /** Fixed-point scale for PageRank ranks: 1 rank unit = 1e-12. */
  private[graft] val PrScale = 1000000000000L

  /** PageRank on the vocab-bounded item graph, `iters` rounds, damping
    * 0.85, FIXED-POINT INT64 arithmetic throughout (1e-12 units):
    * integer sums are exact (no float reassociation), each per-edge
    * contribution rounds half-up identically on every partitioning AND
    * every engine, so the scores are bit-stable across cluster sizes and
    * exactly reproducible in plain SQL — that is what lets both the spec
    * and the DuckDB oracle pin them (an earlier DECIMAL(38,18) form was
    * equally partition-stable but its cross-engine mirror would have
    * hung on Spark's precision-loss rounding rules; integer ops have no
    * such rules). Update rule, identical on both engines:
    *   contrib = (2*r + deg) div (2*deg)          — HALF_UP of r/deg
    *   r' = 0.15*S + (85*sum(contrib) + 50) div 100 — HALF_UP of 0.85*Σ
    * Range: ranks are bounded by |V| (mass conservation), so 85*r stays
    * far inside int64 for any graph whose ranks fit memory at all.
    * Each round is one edge-keyed broadcast join + one hash agg;
    * localCheckpoint bounds lineage (PERF #5). Dangling mass: vertices
    * in the edge list always have out-degree >= 1 by construction
    * (undirected edges traversed both ways), so no sink correction term.
    */
  private[graft] def pagerank(edges: DataFrame, iters: Int): DataFrame = {
    // Execution (r16 opt round): the fixed-iteration loop runs on
    // CO-PARTITIONED RDDs (the ConnectedComponents discipline) — after
    // one-time setup each round is one narrow adj->rank join plus one
    // (dst, contrib) reduceByKey on the shared partitioner, with NO
    // per-round action and no per-round Catalyst planning; all `iters`
    // rounds chain into the single job that materializes the result
    // (the DataFrame form paid a localCheckpoint job + broadcast build
    // per round: 62 jobs for 10 rounds at maintenance grain). The
    // integer arithmetic below is VERBATIM the update rule above, so
    // scores stay bit-identical (graph_pagerank's oracle hash-matches).
    val spark = edges.sparkSession
    import spark.implicits._
    // undirected: each edge contributes both ways
    val directed = edges
      .select(col("u").cast("long").as("src"), col("v").cast("long").as("dst"))
      .unionAll(edges
        .select(col("v").cast("long").as("src"), col("u").cast("long").as("dst")))
      .as[(Long, Long)].rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val defaultParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val nEdges = graft.operators.Jobs.labeled(spark, "pagerank: edge count")(
      directed.count())
    val parts = math.max(1L,
      math.min(defaultParts.toLong, nEdges / 32768 + 1)).toInt
    val part = new org.apache.spark.HashPartitioner(parts)
    val adj = directed.partitionBy(part)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-partition degree count per src == global (keys co-located)
    val deg = adj.mapPartitions({ it =>
      val d = new java.util.HashMap[Long, Long]()
      it.foreach { case (s, _) => d.merge(s, 1L, (a, b) => a + b) }
      scala.jdk.CollectionConverters.IteratorHasAsScala(
        d.entrySet().iterator()).asScala
        .map(e => (e.getKey.longValue(), e.getValue.longValue()))
    }, preservesPartitioning = true)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val adjDeg = adj.join(deg) // narrow: both on `part`
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var ranks = deg.mapValues(_ => PrScale)
    var i = 0
    while (i < iters) {
      val inSum = adjDeg.join(ranks) // narrow: both on `part`
        .map { case (_, ((dst, d), r)) => (dst, (2L * r + d) / (2L * d)) }
        .reduceByKey(part, _ + _)
      ranks = deg.leftOuterJoin(inSum) // narrow: both on `part`
        .mapValues { case (_, s) =>
          PrScale * 3 / 20 + (85L * s.getOrElse(0L) + 50L) / 100L
        }
      i += 1
    }
    // v keeps the caller's node type (the loop runs on longs internally)
    val vType = edges.schema("u").dataType
    val out = graft.operators.Jobs.labeled(spark, "pagerank: materialize")(
      org.apache.spark.sql.graftbridge.StatsBridge.dropCarriedStats(
        ranks.toDF("v", "r").select(col("v").cast(vType).as("v"), col("r"))
          .localCheckpoint(true)))
    Seq(directed, adj, deg, adjDeg).foreach(_.unpersist(blocking = false))
    out
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Top-20 PageRank items (10 rounds), fully oracled: fixed-point
    // int64 iteration is bit-identical in any engine, so the DuckDB
    // oracle unrolls the same 10 integer-arithmetic rounds over the same
    // edge set and the gate hash-matches the scores exactly.
    "graph_pagerank" -> ((s, dir) => {
      val edges = Cooccurrence.coocCounts(Cooccurrence.interactions(s, dir))
        .where(col("item") < col("other") && col("cnt") >= 3)
        .select(col("item").as("u"), col("other").as("v"))
      pagerank(edges, 10)
        .select(col("v").as("item"),
          (col("r").cast("double") / lit(PrScale.toDouble)).as("rank"))
        .orderBy(col("rank").desc, col("item")).limit(20)
    }),

    // Calendar gap-fill + forward-fill: daily value sums per event type
    // over the full min..max calendar, missing days carrying the last
    // observed value (and a fill flag). The scaffold calendar is a tiny
    // broadcast cross; the fill is last_value(ignoreNulls) over a
    // type-partitioned window — no driver loops, no UDFs.
    "timeseries_fill" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .where(col("value") > 190) // sparsify: rare rows make real gaps at every SF
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast(DecimalType(20, 4))).as("v"))
      val bounds = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      val calendar = bounds.select(explode(sequence(col("lo"), col("hi"))).as("day"))
      val types = daily.select(col("event_type")).distinct()
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, 0)
      types.crossJoin(broadcast(calendar))
        .join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"), col("v"),
          last(col("v"), ignoreNulls = true).over(w).cast("double").as("filled"),
          col("v").isNull.as("was_gap"))
        // -1 sentinels: the gate's pandas path reads NULL doubles as NaN
        // (repo convention, see window_ignore_nulls); gaps carry was_gap
        .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          coalesce(col("v").cast("double"), lit(-1.0)).as("observed"),
          coalesce(col("filled"), lit(-1.0)).as("filled"), col("was_gap"))
        .orderBy(col("event_type"), col("day"))
    }),

    // Point-in-time feature join: for each labeled example (purchase
    // events), the latest value of each feature AS OF the label time —
    // never a future leak. Two as-of joins expressed as partitioned
    // window ranks over time-bounded equi-join candidates; at scale both
    // sides shuffle once on the entity key.
    "feature_pit_join" -> ((s, dir) => {
      val labels = Tables.events(s, dir)
        .where(col("event_type") === "purchase")
        .select(col("event_id").as("label_id"), col("user_id"),
          expr("unix_micros(ts)").as("label_us"))
      // feature 1: the user's latest pre-label event value (any type)
      val f1src = Tables.events(s, dir)
        .select(col("user_id").as("f1_user"), expr("unix_micros(ts)").as("f1_us"),
          col("event_id").as("f1_id"), col("value").as("f1_value"))
      val w1 = Window.partitionBy(col("label_id"))
        .orderBy(col("f1_us").desc, col("f1_id").desc)
      // LEFT join: a label whose user has no prior events keeps its row
      // with the sentinel — training sets don't silently drop examples
      val withF1 = labels.join(f1src,
          col("user_id") === col("f1_user") && col("f1_us") < col("label_us"), "left")
        .withColumn("rn", row_number().over(w1)).where(col("rn") === 1)
        .select(col("label_id"), col("user_id"), col("label_us"),
          coalesce(col("f1_value"), lit(-1.0)).as("f1_value"))
      // feature 2: the user's latest order total as of the label time
      val f2src = Tables.table(s, dir, "orders")
        .select(col("o_custkey"), expr("unix_micros(o_orderdate::timestamp)").as("f2_us"),
          col("o_orderkey"), col("o_totalprice"))
      val w2 = Window.partitionBy(col("label_id"))
        .orderBy(col("f2_us").desc, col("o_orderkey").desc)
      withF1.join(f2src,
          col("user_id") === col("o_custkey") && col("f2_us") <= col("label_us"), "left")
        .withColumn("rn", row_number().over(w2)).where(col("rn") === 1)
        .select(col("label_id"), col("user_id"), col("f1_value"),
          coalesce(col("o_totalprice"), lit(-1.0)).as("f2_order_total"))
        .orderBy(col("label_id"))
    })
  )

  /** DuckDB mirror of the fixed-point PageRank: the identical integer
    * update rule unrolled for 10 rounds over the identical edge set —
    * bit-exact, so the gate hash-matches the scores. `//` is DuckDB's
    * floor division; all operands are non-negative, matching Spark's
    * `DIV`. */
  private def pagerankOracle: String = {
    val iters = (1 to 10).map { k =>
      s"""r$k AS (
         |  SELECT g.src AS v,
         |         ${PrScale * 3 / 20} + (85 * COALESCE(s.in_sum, 0) + 50) // 100 AS r
         |  FROM deg g LEFT JOIN (
         |    SELECT a.dst, SUM((2 * p.r + a.deg) // (2 * a.deg)) AS in_sum
         |    FROM adj a JOIN r${k - 1} p ON p.v = a.src
         |    GROUP BY a.dst) s ON s.dst = g.src)""".stripMargin
    }.mkString(",\n")
    SparkEntry.pairsSql +
      s""", edges AS (
         |  SELECT item AS u, other AS v FROM pairs WHERE item < other AND cnt >= 3),
         |directed AS (
         |  SELECT u AS src, v AS dst FROM edges
         |  UNION ALL
         |  SELECT v AS src, u AS dst FROM edges),
         |deg AS (SELECT src, COUNT(*) AS deg FROM directed GROUP BY src),
         |adj AS (SELECT d.src, d.dst, g.deg FROM directed d JOIN deg g ON g.src = d.src),
         |r0 AS (SELECT src AS v, CAST($PrScale AS BIGINT) AS r FROM deg),
         |$iters
         |SELECT item, rank FROM (
         |  SELECT v AS item, CAST(r AS DOUBLE) / $PrScale.0 AS rank,
         |         ROW_NUMBER() OVER (ORDER BY r DESC, v) AS rn
         |  FROM r10)
         |WHERE rn <= 20 ORDER BY rank DESC, item""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(

    "graph_pagerank" -> pagerankOracle,

    "timeseries_fill" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         SUM(CAST(value AS DECIMAL(20,4))) AS v
        |  FROM events WHERE value > 190 GROUP BY 1, 2),
        |b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
        |cal AS (SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        |scaffold AS (SELECT t.event_type, c.day
        |             FROM (SELECT DISTINCT event_type FROM daily) t, cal c)
        |SELECT s.event_type, strftime(s.day, '%Y-%m-%d') AS day,
        |       COALESCE(CAST(d.v AS DOUBLE), -1.0) AS observed,
        |       COALESCE(CAST(last_value(d.v IGNORE NULLS) OVER (
        |              PARTITION BY s.event_type ORDER BY s.day
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), -1.0) AS filled,
        |       d.v IS NULL AS was_gap
        |FROM scaffold s LEFT JOIN daily d
        |  ON s.event_type = d.event_type AND s.day = d.day
        |ORDER BY s.event_type, s.day""".stripMargin,

    "feature_pit_join" ->
      """WITH labels AS (
        |  SELECT event_id AS label_id, user_id, ts AS label_ts
        |  FROM events WHERE event_type = 'purchase'),
        |f1 AS (SELECT label_id, user_id, label_ts,
        |              COALESCE(f1_value, -1.0) AS f1_value FROM (
        |         SELECT l.label_id, l.user_id, l.label_ts, e.value AS f1_value,
        |                ROW_NUMBER() OVER (PARTITION BY l.label_id
        |                  ORDER BY e.ts DESC, e.event_id DESC) AS rn
        |         FROM labels l LEFT JOIN events e
        |           ON l.user_id = e.user_id AND e.ts < l.label_ts)
        |       WHERE rn = 1),
        |f2 AS (SELECT f1.label_id, f1.user_id, f1.f1_value, o.o_totalprice,
        |              ROW_NUMBER() OVER (PARTITION BY f1.label_id
        |                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |       FROM f1 LEFT JOIN orders o
        |         ON f1.user_id = o.o_custkey AND o.o_orderdate <= f1.label_ts)
        |SELECT label_id, user_id, f1_value,
        |       COALESCE(o_totalprice, -1.0) AS f2_order_total
        |FROM f2 WHERE rn = 1 ORDER BY label_id""".stripMargin
  )
}
