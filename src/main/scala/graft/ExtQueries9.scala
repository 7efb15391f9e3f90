package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Cooccurrence, Multimodal, PortableHash, Tables}

/**
 * Round-5 wave: graph analytics over the bounded item-cooccurrence graph
 * (triangles, neighborhood Jaccard), a 2-D skyline (pareto front) with a
 * scale prefilter, vocabulary-coverage pruning, sparse token-count
 * document cosine via a df-capped inverted index, media checksum dedup
 * through the binary payload path, last-touch attribution, and
 * deterministic in-batch negative sampling.
 *
 * Scale stances per query are on each entry; every float that crosses an
 * engine boundary is either exact integer arithmetic, a correctly-rounded
 * sqrt/division of integers, or ROUND(..., 4)-guarded.
 */
object ExtQueries9 {

  /** Undirected item co-occurrence graph (u < v, cooc count >= 3). The
    * vertex set is the ITEM VOCABULARY, so however large the event log,
    * the graph is vocab-bounded — the standard trick that makes item-graph
    * analytics feasible at 100 TB (events aggregate into edges; the edge
    * list, not the log, feeds the graph ops). */
  private def itemEdges(s: SparkSession, dir: String): DataFrame =
    Cooccurrence.coocCounts(Cooccurrence.interactions(s, dir))
      .where(col("item") < col("other") && col("cnt") >= 3)
      .select(col("item").as("u"), col("other").as("v"))

  /** Edges re-oriented by DEGREE: `a` is the endpoint with the smaller
    * (degree, id). Out-degree under this orientation is bounded by
    * O(sqrt(|E|)) on any graph (arboricity bound), so wedge enumeration
    * from `a` never fans out deg^2 on hub vertices — the id-orientation's
    * 100x-scale weakness (r5 verdict). The degree table is vocab-bounded,
    * hence broadcast. */
  private[graft] def orientedEdges(e: DataFrame): DataFrame = {
    val deg = e.select(col("u").as("x")).union(e.select(col("v").as("x")))
      .groupBy(col("x")).agg(count(lit(1)).as("d"))
    e.join(broadcast(deg.select(col("x").as("u"), col("d").as("du"))), "u")
      .join(broadcast(deg.select(col("x").as("v"), col("d").as("dv"))), "v")
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("fst"), col("v").as("snd")))
          .otherwise(struct(col("v").as("fst"), col("u").as("snd"))).as("o"))
      .select(col("o.fst").as("a"), col("o.snd").as("b"))
  }

  /** Wedge pairs (x; y, z) — two distinct out-edges of the same vertex in
    * the degree orientation. |wedges| = sum_a outdeg(a)*(outdeg(a)-1),
    * bounded by the orientation; each unordered out-pair appears twice
    * (y,z) and (z,y), and exactly one of the two closes against an
    * oriented third edge. */
  private[graft] def wedges(o: DataFrame): DataFrame =
    o.as("e1")
      .join(o.as("e2"), col("e1.a") === col("e2.a") && col("e1.b") =!= col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))

  /** Each triangle materializes exactly once: its (degree, id)-minimal
    * vertex is the only one with two out-edges inside the triangle, and
    * only the orientation-consistent (y, z) wedge closes. */
  private[graft] def triangles(o: DataFrame): DataFrame =
    wedges(o)
      .join(o.as("e3"), col("e3.a") === col("y") && col("e3.b") === col("z"))
      .select(col("x"), col("y"), col("z"))

  /** negative_sample's fixed probe-sequence length: how many hash-derived
    * candidate ids each user tries before settling for fewer than 5
    * negatives. 128 probes for 5 keeps leaves enormous margin on any
    * near-dense catalog (see the query's doc); shared with the SQL mirror
    * so the two engines replay the identical sequence. */
  private[graft] val NegProbes = 128

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // triangle count on the item graph, DEGREE-oriented (r6): each
    // triangle materializes exactly once at its orientation-minimal
    // vertex, and per-vertex wedge fan-out is bounded by sqrt(|E|) even
    // on hub vertices — the join shape a 100x scale-up needs. The count
    // is orientation-invariant, so the id-oriented oracle is unchanged.
    "graph_triangles" -> ((s, dir) => {
      val e = itemEdges(s, dir).localCheckpoint(true)
      val o = orientedEdges(e).localCheckpoint(true) // 3-way self-join: scan once
      val tri = triangles(o).agg(count(lit(1)).as("n_triangles"))
      e.agg(count(lit(1)).as("n_edges")).crossJoin(tri) // two 1-row aggregates
    }),

    // neighborhood Jaccard per edge (link-prediction feature). Common
    // neighbors of an EDGE (u,v) are exactly the triangles through it, so
    // the degree-oriented triangle enumeration (bounded wedge fan-out)
    // replaces the old adj-self-join that fanned out deg^2 on hubs: each
    // triangle contributes one common neighbor to each of its 3 edges.
    // Degrees via one hash agg; ratio of integers rounded to 4 dp.
    "graph_jaccard" -> ((s, dir) => {
      val e = itemEdges(s, dir).localCheckpoint(true)
      val o = orientedEdges(e).localCheckpoint(true)
      val deg = e.select(col("u").as("x")).union(e.select(col("v").as("x")))
        .groupBy(col("x")).agg(count(lit(1)).as("deg"))
      val common = triangles(o)
        .select(explode(array(
          struct(least(col("x"), col("y")).as("cu"), greatest(col("x"), col("y")).as("cv")),
          struct(least(col("x"), col("z")).as("cu"), greatest(col("x"), col("z")).as("cv")),
          struct(least(col("y"), col("z")).as("cu"), greatest(col("y"), col("z")).as("cv"))))
          .as("p"))
        .groupBy(col("p.cu").as("u"), col("p.cv").as("v"))
        .agg(count(lit(1)).as("common"))
      e.join(common, Seq("u", "v"))
        .join(broadcast(deg.select(col("x").as("u"), col("deg").as("du"))), "u")
        .join(broadcast(deg.select(col("x").as("v"), col("deg").as("dv"))), "v")
        .select(col("u"), col("v"),
          round(col("common").cast("double") /
            (col("du") + col("dv") - col("common")), 4).as("jaccard"))
        .orderBy(col("jaccard").desc, col("u"), col("v"))
        .limit(20)
    }),

    // 2-D skyline (pareto front) over urgent orders: points that no other
    // point beats on BOTH price and date. Distinct points first (one hash
    // agg), then a broadcast prefilter — anything below the P90 price AND
    // older than the top decile's best date is dominated by that decile's
    // best point — so the global-order window runs over a residue that
    // shrinks toward the skyline itself (~log n points on random data);
    // the full sort never happens at scale.
    "pareto_front" -> ((s, dir) => {
      val pts = Tables.table(s, dir, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_totalprice").as("price"), to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).as("n_orders"))
      val thr = pts.agg(expr("percentile(price, 0.9)").as("p90"))
      val best = pts.join(broadcast(thr))
        .where(col("price") >= col("p90"))
        .agg(max(col("d")).as("best_hi_date"))
      val pruned = pts.join(broadcast(thr)).join(broadcast(best))
        .where(!(col("price") < col("p90") && col("d") < col("best_hi_date")))
      val w = Window.orderBy(col("price").desc, col("d").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      pruned
        .withColumn("dmax", max(col("d")).over(w))
        .where(col("dmax").isNull || col("dmax") < col("d"))
        .select(col("price"), date_format(col("d"), "yyyy-MM-dd").as("odate"), col("n_orders"))
        .orderBy(col("price").desc)
    }),

    // vocabulary pruning with coverage stats: top-500 words by document
    // frequency, then per-source token coverage. The global top-500 is
    // orderBy+limit — Spark plans TakeOrderedAndProject (per-partition
    // bounded heaps, merged once), NOT a single-partition row_number
    // window over the full vocabulary (r5 verdict item 4). The ordering
    // (df desc, w) is total, so the cut is deterministic. All-integer
    // outputs — no cross-engine float at all.
    "vocab_prune" -> ((s, dir) => {
      val toks = Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("source"), explode(split(col("text"), " ")).as("w"))
        .where(col("w") =!= "")
      val dfreq = toks.groupBy(col("w")).agg(countDistinct(col("doc_id")).as("df"))
      val vocab = dfreq.orderBy(col("df").desc, col("w")).limit(500)
        .select(col("w"), lit(1L).as("inv"))
      toks
        .join(broadcast(vocab), Seq("w"), "left")
        .groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("nt"), sum(coalesce(col("inv"), lit(0L))).as("nv"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nt")).as("sum_tokens"),
          sum(col("nv")).as("sum_invocab"),
          sum(when(col("nv") * 10 >= col("nt") * 9, 1L).otherwise(0L)).as("n_docs_cov90"))
        .orderBy(col("source"))
    }),

    // sparse document cosine over token counts via a df-capped inverted
    // index: stop-ish words (df > 50) leave the index BEFORE the pair
    // join (broadcast anti-join of the small frequent set — same cap
    // pattern as dedup_ngram_capped), so per-word fan-out is <= 50^2 and
    // the pair partials stay bounded however large the corpus. Dot
    // products are exact integers; norms are correctly-rounded sqrt of
    // integers — bit-identical across engines.
    "text_cosine_pairs" -> ((s, dir) => {
      val tf = Tables.table(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .where(col("w") =!= "")
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      val hot = tf.groupBy(col("w")).agg(count(lit(1)).as("df")).where(col("df") > 50)
      val kept = tf.join(broadcast(hot.select(col("w"))), Seq("w"), "left_anti")
      val norms = kept.groupBy(col("doc_id"))
        .agg(sqrt(sum(col("tf") * col("tf")).cast("double")).as("nrm"))
      kept.as("a")
        .join(kept.as("b"),
          col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(sum(col("a.tf") * col("b.tf")).as("dot"))
        // norms are corpus-cardinality: equi-join them (the dots table
        // is df-cap-bounded) rather than broadcasting a per-doc table
        .join(norms.select(col("doc_id").as("doc_a"), col("nrm").as("na")), "doc_a")
        .join(norms.select(col("doc_id").as("doc_b"), col("nrm").as("nb")), "doc_b")
        .withColumn("cosr", col("dot").cast("double") / (col("na") * col("nb")))
        .where(col("cosr") >= 0.5)
        .select(col("doc_a"), col("doc_b"), round(col("cosr"), 4).as("cos"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // media checksum dedup through the BINARY payload path (the standard
    // first pass of an image-corpus pipeline: exact-byte dedup by digest
    // before any perceptual hashing). Emits the full digest -> keeper
    // mapping (n holds the duplicate count; the driver corpus happens to
    // be dup-free, so every n is 1 — the mapping itself is the check).
    // Payloads never shuffle — only the 16-byte digest does.
    "media_checksum_dedup" -> ((s, dir) =>
      Multimodal.mediaTable(Tables.table(s, dir, "documents"))
        .groupBy(lower(hex(col("payload"))).as("checksum"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keeper"))
        .orderBy(col("checksum"))),

    // last-touch attribution: each purchase attributed to the user's
    // latest click/view in the 7 days before it. Per-user equi-join +
    // in-window filter + row_number — the as-of-join shape; at scale the
    // user key bounds the join and salting handles power users.
    "attribution_last_touch" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      // explicit side aliases (r5 advice): the two projections come from
      // the same scan, and a bare p("user_id") === t("user_id") only
      // resolves through fragile Dataset-id disambiguation
      val p = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
        .as("p")
      val t = ev.where(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("event_id").as("touch_id"),
          col("event_type").as("channel"), col("ts").as("tts"))
        .as("t")
      val w = Window.partitionBy(col("purchase_id"))
        .orderBy(col("tts").desc, col("touch_id").desc)
      p.join(t,
          col("p.user_id") === col("t.user_id") &&
            col("tts") < col("pts") &&
            col("tts") >= col("pts") - expr("INTERVAL 7 DAY"), "left")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("purchase_id"), col("p.user_id").as("user_id"),
          coalesce(col("touch_id"), lit(-1L)).as("attributed_event"),
          coalesce(col("channel"), lit("none")).as("channel"))
        .orderBy(col("purchase_id"))
    }),

    // KNN label propagation (auto-labeling): majority label of the 5
    // exact nearest neighbors, ties to the smallest label. The KNN scan
    // broadcasts the query set and never shuffles the corpus; the vote
    // is a tiny hash agg over |queries| x k rows.
    "knn_label" -> ((s, dir) => {
      val queryIds = (0L until 20L).toSeq
      val top = operators.Similarity.bruteForceTopK(
        Tables.table(s, dir, "embeddings"), queryIds, 5)
      val labels = Tables.table(s, dir, "embeddings")
        .select(col("vec_id"), col("label"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("votes").desc, col("label"))
      // broadcast the |queries| x k TOP side, never the corpus-sized
      // labels table (review r5: the small side is the top-K rows)
      labels.join(broadcast(top), "vec_id")
        .groupBy(col("query_id"), col("label"))
        .agg(count(lit(1)).as("votes"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("query_id"), col("label").as("pred_label"), col("votes"))
        .orderBy(col("query_id"))
    }),

    // stream-static join: the streaming enrichment shape — a file-source
    // stream joined against a broadcast static dimension (no state, no
    // watermark needed for the join itself), then a windowless global
    // aggregation per nation. At scale the static side is a broadcast
    // (or a bucketed table for big dims); the stream side never
    // re-shuffles for the join.
    "stream_static_join" -> ((s, dir) => {
      val cust = Tables.table(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val joined = graft.streaming.StreamingOps.eventsStream(s, dir)
        .join(broadcast(cust), col("user_id") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(20, 4)))
            .cast("double").as("sum_value"))
      graft.streaming.StreamingOps.runToMemory(
          joined, s"ssj_${System.nanoTime()}")
        .orderBy(col("c_nationkey"))
    }),

    // deterministic in-batch negative sampling: up to 5 non-interacted
    // catalog items per user, drawn by a fixed PROBE SEQUENCE — the same
    // sample on any partitioning, cluster size, or engine. r9 rewrite
    // (r9 verdict #6): the item vocabulary never reaches the driver and
    // the per-user work is O(NegProbes), not O(|vocab|):
    //   probe j of user u proposes item H(u#j) mod (maxItem+1); probes
    //   that hit a real catalog item (distributed semi-join against the
    //   vocab) and are not a positive (distributed anti-join against the
    //   user's interactions) survive; each user keeps the first 5
    //   DISTINCT surviving items in probe order.
    // Every join key is (user) or (item) hash-partitionable; the probe
    // table is U x NegProbes rows — linear in users with a constant
    // factor, vs the old broadcast-vocab loop's U x V hash evaluations
    // (10^15 at 100M users x 10M items). The window rank runs over at
    // most NegProbes rows per user. maxItem is a 1-row aggregate (a
    // scalar, not the vocabulary). Acceptance per probe is
    // |vocab|/(maxItem+1) x P(non-positive) — catalogs are near-dense in
    // id space, so 128 probes for 5 keeps leave enormous margin.
    "negative_sample" -> ((s, dir) => {
      val inter = Cooccurrence.interactions(s, dir)
        .where(col("user").isNotNull && col("item").isNotNull)
        .select(col("user"), col("item")).distinct()
        .localCheckpoint(true) // scanned 3x: users, vocab, anti-join
      val vocab = inter.select(col("item")).distinct()
      // nullable read: an empty catalog short-circuits to an empty frame
      // instead of NPE-ing on max(NULL) (r10 advice)
      Option(vocab.agg(max(col("item"))).head.get(0)) match {
        case None =>
          inter.select(col("user"), lit(1).as("rnk"), col("item")).limit(0)
        case Some(maxItem: Int) =>
          val domain = maxItem + 1L
          val probes = inter.select(col("user")).distinct()
            .select(col("user"), explode(sequence(lit(1), lit(NegProbes))).as("j"))
            .withColumn("item",
              (PortableHash.h(concat(col("user").cast("string"), lit("#"),
                col("j").cast("string"))) % domain).cast("int"))
          val first = probes
            .join(vocab, Seq("item"), "left_semi")
            .join(inter, Seq("user", "item"), "left_anti")
            .groupBy(col("user"), col("item")).agg(min(col("j")).as("j"))
          val w = Window.partitionBy(col("user")).orderBy(col("j"))
          first.withColumn("rnk", row_number().over(w))
            .where(col("rnk") <= 5)
            .select(col("user"), col("rnk"), col("item"))
            .orderBy(col("user"), col("rnk"))
        case Some(other) =>
          throw new IllegalStateException(
            s"negative_sample expects an int item column, max(item) was $other " +
              s"(${other.getClass.getName}) — widen the probe-domain arithmetic if " +
              "the catalog schema changes")
      }
    })
  )

  private val edgesSql =
    SparkEntry.pairsSql +
      ", e AS (SELECT item AS u, other AS v FROM pairs WHERE item < other AND cnt >= 3)\n"

  def oracleSql: Map[String, String] = Map(

    "graph_triangles" -> (edgesSql +
      """SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
        |       (SELECT CAST(COUNT(*) AS BIGINT)
        |        FROM e e1 JOIN e e2 ON e2.u = e1.v
        |                  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles""".stripMargin),

    "graph_jaccard" -> (edgesSql +
      """, adj AS (SELECT u AS x, v AS w FROM e UNION ALL SELECT v AS x, u AS w FROM e),
        |deg AS (SELECT x, COUNT(*) AS deg FROM adj GROUP BY x),
        |com AS (
        |  SELECT n1.x AS u, n2.x AS v, COUNT(*) AS c
        |  FROM adj n1 JOIN adj n2 ON n1.w = n2.w AND n1.x < n2.x
        |  GROUP BY n1.x, n2.x)
        |SELECT e.u, e.v, ROUND(CAST(c AS DOUBLE) / (du.deg + dv.deg - c), 4) AS jaccard
        |FROM e JOIN com ON com.u = e.u AND com.v = e.v
        |JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v
        |ORDER BY jaccard DESC, e.u, e.v LIMIT 20""".stripMargin),

    "pareto_front" ->
      """WITH pts AS (
        |  SELECT o_totalprice AS price, CAST(o_orderdate AS DATE) AS d,
        |         COUNT(*) AS n_orders
        |  FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1, 2),
        |sky AS (
        |  SELECT price, d, n_orders,
        |         MAX(d) OVER (ORDER BY price DESC, d DESC
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS dmax
        |  FROM pts)
        |SELECT price, strftime(d, '%Y-%m-%d') AS odate, n_orders
        |FROM sky WHERE dmax IS NULL OR dmax < d ORDER BY price DESC""".stripMargin,

    "vocab_prune" ->
      """WITH toks AS (
        |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS w FROM documents),
        |t AS (SELECT * FROM toks WHERE w != ''),
        |dfreq AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM t GROUP BY w),
        |vocab AS (SELECT w FROM (
        |  SELECT w, ROW_NUMBER() OVER (ORDER BY df DESC, w) AS rk FROM dfreq)
        |  WHERE rk <= 500),
        |per AS (
        |  SELECT doc_id, source, COUNT(*) AS nt,
        |         SUM(CASE WHEN w IN (SELECT w FROM vocab) THEN 1 ELSE 0 END) AS nv
        |  FROM t GROUP BY doc_id, source)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(nt) AS BIGINT) AS sum_tokens,
        |       CAST(SUM(nv) AS BIGINT) AS sum_invocab,
        |       CAST(SUM(CASE WHEN nv * 10 >= nt * 9 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_cov90
        |FROM per GROUP BY source ORDER BY source""".stripMargin,

    "text_cosine_pairs" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM toks WHERE w != '' GROUP BY doc_id, w),
        |kept AS (SELECT * FROM tf WHERE w NOT IN (
        |  SELECT w FROM tf GROUP BY w HAVING COUNT(*) > 50)),
        |norms AS (SELECT doc_id, sqrt(CAST(SUM(tf * tf) AS DOUBLE)) AS nrm
        |          FROM kept GROUP BY doc_id),
        |dots AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.tf * b.tf) AS dot
        |  FROM kept a JOIN kept b ON a.w = b.w AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |cosd AS (
        |  SELECT doc_a, doc_b, CAST(dot AS DOUBLE) / (na.nrm * nb.nrm) AS cosr
        |  FROM dots JOIN norms na ON na.doc_id = doc_a
        |            JOIN norms nb ON nb.doc_id = doc_b)
        |SELECT doc_a, doc_b, ROUND(cosr, 4) AS cos FROM cosd
        |WHERE cosr >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,

    "media_checksum_dedup" ->
      """SELECT md5(text) AS checksum, CAST(COUNT(*) AS BIGINT) AS n,
        |       MIN(doc_id) AS keeper
        |FROM documents GROUP BY md5(text)
        |ORDER BY checksum""".stripMargin,

    "knn_label" -> {
      val quant = """q AS (
        |  SELECT vec_id,
        |         [CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) for x in embedding] AS qv
        |  FROM embeddings),
        |qn AS (SELECT vec_id, qv, list_inner_product(qv, qv) AS n2 FROM q)""".stripMargin
      s"""WITH $quant,
         |scored AS (
         |  SELECT qq.vec_id AS query_id, c.vec_id,
         |         ROUND(list_inner_product(qq.qv, c.qv) / (sqrt(qq.n2) * sqrt(c.n2)), 4) AS cos
         |  FROM qn qq JOIN qn c ON c.vec_id != qq.vec_id
         |  WHERE qq.vec_id BETWEEN 0 AND 19),
         |ranked AS (
         |  SELECT query_id, vec_id,
         |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
         |  FROM scored),
         |votes AS (
         |  SELECT r.query_id, e.label, COUNT(*) AS votes
         |  FROM ranked r JOIN embeddings e ON e.vec_id = r.vec_id
         |  WHERE r.rnk <= 5 GROUP BY r.query_id, e.label),
         |best AS (
         |  SELECT query_id, label, votes,
         |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY votes DESC, label) AS rn
         |  FROM votes)
         |SELECT query_id, label AS pred_label, votes FROM best WHERE rn = 1
         |ORDER BY query_id""".stripMargin
    },

    "stream_static_join" ->
      """SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "attribution_last_touch" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS pts
        |           FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, event_id AS touch_id, event_type AS channel, ts AS tts
        |      FROM events WHERE event_type IN ('click', 'view')),
        |j AS (
        |  SELECT p.purchase_id, p.user_id, t.touch_id, t.channel,
        |         ROW_NUMBER() OVER (PARTITION BY p.purchase_id
        |                            ORDER BY t.tts DESC, t.touch_id DESC) AS rn
        |  FROM p LEFT JOIN t
        |    ON p.user_id = t.user_id AND t.tts < p.pts
        |       AND t.tts >= p.pts - INTERVAL 7 DAY)
        |SELECT purchase_id, user_id, COALESCE(touch_id, -1) AS attributed_event,
        |       COALESCE(channel, 'none') AS channel
        |FROM j WHERE rn = 1 ORDER BY purchase_id""".stripMargin,

    "negative_sample" -> {
      val hp = PortableHash.hSql("CAST(u.usr AS VARCHAR) || '#' || CAST(j.j AS VARCHAR)")
      s"""WITH inter AS (
         |  SELECT DISTINCT user_id AS usr,
         |         CAST(json_extract_string(props, 'k') AS INT) AS item
         |  FROM events
         |  WHERE user_id IS NOT NULL
         |    AND json_extract_string(props, 'k') IS NOT NULL),
         |items AS (SELECT DISTINCT item FROM inter),
         |users AS (SELECT DISTINCT usr FROM inter),
         |dom AS (SELECT MAX(item) + 1 AS m FROM items),
         |probes AS (
         |  SELECT u.usr, j.j,
         |         CAST($hp % (SELECT m FROM dom) AS INT) AS item
         |  FROM users u CROSS JOIN (SELECT UNNEST(range(1, ${NegProbes + 1})) AS j) j),
         |first AS (
         |  SELECT p.usr, p.item, MIN(p.j) AS j
         |  FROM probes p
         |  WHERE EXISTS (SELECT 1 FROM items i WHERE i.item = p.item)
         |    AND NOT EXISTS (
         |      SELECT 1 FROM inter x WHERE x.usr = p.usr AND x.item = p.item)
         |  GROUP BY p.usr, p.item),
         |ranked AS (
         |  SELECT usr, item,
         |         ROW_NUMBER() OVER (PARTITION BY usr ORDER BY j) AS rnk
         |  FROM first)
         |SELECT usr AS "user", rnk, item FROM ranked WHERE rnk <= 5
         |ORDER BY "user", rnk""".stripMargin
    }
  )
}
