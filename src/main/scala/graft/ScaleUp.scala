package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Soak-test data generator: replicates the driver-written sf0.1 tables
  * `copies`× with key offsets, producing an sf1-equivalent dataset for
  * scaling-exponent measurements (round-5 verdict item 7).
  *
  * Fidelity rules (so 10× data means ~10× WORK, not a different problem):
  *   - `region`/`nation` stay fixed (TPC-H scaling convention).
  *   - Every other table replicates with primary/foreign keys offset by
  *     `replica * span` (span = next power of 10 above the base max key),
  *     so FK joins land on the same replica and join fan-out per key is
  *     unchanged.
  *   - `documents.text` gets a per-replica word suffix for replicas > 0:
  *     within-replica dup/near-dup structure is preserved exactly, while
  *     cross-replica docs share no shingles — otherwise every doc would
  *     be a true near-dup of its 9 clones and LSH candidate volume would
  *     grow ~copies² for data reasons rather than plan reasons.
  *   - `embeddings.embedding` is circularly shifted by the replica index:
  *     a coordinate permutation is orthogonal, so all within-replica
  *     inner products (and thus the ANN/dedup neighborhood structure)
  *     are exactly preserved while cross-replica cosine is uncorrelated.
  *
  * Usage: runMain graft.ScaleUp [srcDir] [dstDir] [copies]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("target/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts has shipped as TIMESTAMP(NANOS) in some testdata drops:
      // the legacy flag surfaces that encoding as raw long (written back as
      // plain INT64), while timestamp[us] drops read/write as timestamps —
      // Tables.events is schema-adaptive over both, so sf1 timestamps
      // round-trip exactly either way
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    /** The driver's layout is one parquet FILE per table (the streaming
      * source's `pathGlobFilter=events.parquet` matches leaf file names, so
      * a directory of part files would silently yield an empty stream).
      * Write a single sorted part and move it to `<name>.parquet`. Parquet
      * row groups keep single files splittable for parallel batch reads. */
    def write(df: DataFrame, name: String, sortCols: Seq[String]): Unit = {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val tmp = s"$dst/_tmp_$name"
      df.repartition(1).sortWithinPartitions(sortCols.map(col): _*)
        .write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst.orElseThrow(() => new IllegalStateException(s"no part file in $tmp"))
      Files.createDirectories(Paths.get(dst))
      Files.move(part, Paths.get(s"$dst/$name.parquet"), StandardCopyOption.REPLACE_EXISTING)
      Files.list(Paths.get(tmp)).forEach(p => Files.delete(p))
      Files.delete(Paths.get(tmp))
    }

    /** Next power of 10 above the column's max — keys stay readable and
      * replicas can't collide. One tiny agg job per keyed table. */
    def span(df: DataFrame, col: String): Long = {
      val mx = df.agg(max(col)).head.getLong(0)
      var s = 1L
      while (s <= mx) s *= 10
      s
    }

    // replica index table: `copies` rows, broadcast into every fan-out
    val reps = spark.range(copies).select(col("id").cast("int").as("rep"))
    def fan(df: DataFrame): DataFrame = df.crossJoin(broadcast(reps))
    def off(c: String, s: Long) = (col(c) + col("rep").cast("long") * s).as(c)

    // fixed dims
    write(read("region"), "region", Seq("r_regionkey"))
    write(read("nation"), "nation", Seq("n_nationkey"))

    val customer = read("customer")
    val custSpan = span(customer, "c_custkey")
    write(fan(customer).select(off("c_custkey", custSpan), col("c_name"),
      col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")), "customer", Seq("c_custkey"))

    val supplier = read("supplier")
    val suppSpan = span(supplier, "s_suppkey")
    write(fan(supplier).select(off("s_suppkey", suppSpan), col("s_name"),
      col("s_nationkey"), col("s_acctbal")), "supplier", Seq("s_suppkey"))

    val part = read("part")
    val partSpan = span(part, "p_partkey")
    write(fan(part).select(off("p_partkey", partSpan), col("p_name"),
      col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice")), "part", Seq("p_partkey"))

    val orders = read("orders")
    val orderSpan = span(orders, "o_orderkey")
    write(fan(orders).select(off("o_orderkey", orderSpan), off("o_custkey", custSpan),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority")), "orders", Seq("o_orderkey"))

    val lineitem = read("lineitem")
    write(fan(lineitem).select(off("l_orderkey", orderSpan), off("l_partkey", partSpan),
      off("l_suppkey", suppSpan), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"), col("l_shipdate")), "lineitem", Seq("l_orderkey", "l_linenumber"))

    val events = read("events")
    val evSpan = span(events, "event_id")
    val userSpan = span(events, "user_id")
    write(fan(events).select(off("event_id", evSpan), col("ts"),
      off("user_id", userSpan), col("event_type"), col("value"), col("props")),
      "events", Seq("ts", "event_id"))

    val documents = read("documents")
    val docSpan = span(documents, "doc_id")
    val salted = when(col("rep") === 0, col("text")).otherwise(
      array_join(transform(split(col("text"), " "),
        w => concat(w, lit("_"), col("rep"))), " "))
    write(fan(documents).select(off("doc_id", docSpan), salted.as("text"),
      col("lang"), col("source"), length(salted).cast("long").as("n_chars")),
      "documents", Seq("doc_id"))

    val embeddings = read("embeddings")
    val vecSpan = span(embeddings, "vec_id")
    val dims = embeddings.select(size(col("embedding"))).head.getInt(0)
    // circular shift by rep MOD dims: a raw `rep` shift passes a negative
    // slice length once rep >= dims (copies > 64 crashed the sf10 gen).
    // Caveat for copies > dims: replicas that differ by exactly `dims`
    // share a permutation, so cross-replica embedding orthogonality only
    // holds within a dims-sized replica window — fine for the text/CC
    // soaks run at that scale; embedding-family soaks should stay at
    // copies <= dims.
    val sh = pmod(col("rep"), lit(dims))
    val shifted = when(sh === 0, col("embedding")).otherwise(concat(
      slice(col("embedding"), sh + 1, lit(dims) - sh),
      slice(col("embedding"), lit(1), sh)))
    write(fan(embeddings).select(off("vec_id", vecSpan), shifted.as("embedding"),
      col("label")), "embeddings", Seq("vec_id"))

    val counts = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
      .map(n => n -> spark.read.parquet(s"$dst/$n.parquet").count())
    counts.foreach { case (n, c) => println(f"$n%-12s $c%,d") }
    spark.stop()
  }
}
