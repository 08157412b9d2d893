package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JoinWindowSpec extends AnyFunSuite {
  import TestSpark._

  test("pair counting is a multiset over combinations (SURVEY.md §2.J.1): " +
    "duplicates kept, self-pairs present, total = Σ C(k,2)") {
    import spark.implicits._
    // in-memory fixture replicating the reference trap: a sale with two
    // 'notepad' lines must yield a (notepad, notepad) self-pair
    val names = Seq(
      (1L, Seq("binder", "notepad", "notepad")),
      (2L, Seq("notepad", "binder")),
      (3L, Seq("pens"))
    ).toDF("l_orderkey", "names")
      .select(col("l_orderkey"),
        posexplode(sort_array(col("names"))).as(Seq("pos", "name")))
    val pairs = names.as("a").join(names.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.pos") < col("b.pos"))
      .groupBy(col("a.name").as("p1"), col("b.name").as("p2"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // sale 1: [binder,notepad,notepad] -> (b,n),(b,n),(n,n); sale 2: (b,n)
    assert(pairs(("binder", "notepad")) == 3)
    assert(pairs(("notepad", "notepad")) == 1) // the self-pair
    assert(pairs.values.sum == 3 + 1 + 0) // C(3,2)+C(2,2)+C(1,2)... = 3+1+0
  }

  test("streaks: gaps-and-islands run lengths on a planted calendar") {
    import spark.implicits._
    // part 1: days 1,2,3 then 5,6 -> runs of 3 and 2; part 2: one day
    val days = Seq(
      (1L, "1994-01-01"), (1L, "1994-01-02"), (1L, "1994-01-03"),
      (1L, "1994-01-05"), (1L, "1994-01-06"),
      (1L, "1994-01-02"), // duplicate shipment same day — must not split runs
      (2L, "1994-03-10")
    ).toDF("l_partkey", "l_shipdate")
      .select(col("l_partkey"), col("l_shipdate").cast("timestamp").as("l_shipdate"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_partkey")).orderBy(col("d"))
    val runs = days
      .select(col("l_partkey"), col("l_shipdate").cast("date").as("d")).distinct()
      .withColumn("anchor", date_sub(col("d"), row_number().over(w)))
      .groupBy(col("l_partkey"), col("anchor")).agg(count(lit(1)).as("len"))
      .groupBy(col("l_partkey"))
      .agg(max(col("len")).as("max_streak"), sum(col("len")).as("n_active_days"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(runs(1L) == (3L, 5L), s"part 1: $runs")
    assert(runs(2L) == (1L, 1L), s"part 2: $runs")
    // and the registered query returns one row per active part on testdata
    val q = operators.JoinWindowQueries.winStreaks(spark, sf)
    val nParts = Tables.lineitem(spark, sf)
      .select("l_partkey").distinct().count()
    assert(q.count() == nParts)
    assert(q.where(col("max_streak") > col("n_active_days")).isEmpty,
      "a streak can never exceed the active-day count")
  }

  test("pair query total equals Σ C(basket,2) on testdata") {
    val total = operators.JoinWindowQueries.joinPairSelfjoin(spark, sf)
      .agg(sum("n")).head.getLong(0)
    val expected = Tables.lineitem(spark, sf)
      .groupBy("l_orderkey").agg(count(lit(1)).as("k"))
      .agg(sum(expr("k * (k - 1) / 2"))).head.getDouble(0).toLong
    assert(total == expected)
  }

  test("lag features: lag_i(row) == quantity at row-i within partition") {
    import spark.implicits._
    val lf = operators.JoinWindowQueries.winLagFeatures(spark, sf)
      .where($"product" === $"product") // no-op, keeps lineage simple
      .limit(0) // schema check only below; data check via one product
    assert((1 to 14).forall(i => lf.columns.contains(s"lag_$i")))
    val one = operators.JoinWindowQueries.winLagFeatures(spark, sf)
      .orderBy("product", "sale_date").limit(30).collect()
    // lag_1 of row n should equal total_quantity of previous row when same product
    one.sliding(2).foreach {
      case Array(prev, cur) if prev.getString(1) == cur.getString(1) =>
        assert(cur.getAs[Double]("lag_1") == prev.getAs[Double]("total_quantity"))
      case _ =>
    }
  }

  test("top-k per group returns at most k rows per group, ranked") {
    val df = operators.JoinWindowQueries.topkHeadPerGroup(spark, sf)
    val per = df.groupBy("c_mktsegment").count().collect()
    assert(per.forall(_.getLong(1) <= 10))
  }

  test("left enrich plan broadcasts the dimension") {
    val plan = operators.JoinWindowQueries.joinLeftEnrich(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("as-of join compiles to the union-sentinel window plan: " +
    "no join operator, one window over the key partition") {
    val plan = operators.JoinWindowQueries.joinAsof(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin")
      && !plan.contains("ShuffledHashJoin"),
      s"as-of must not materialize a join:\n$plan")
    assert(plan.contains("Window"), s"expected window carry-forward:\n$plan")
  }

  test("bucketed range join: pure equi-join plan (no nested loop), " +
    "every event matched to exactly one containing session") {
    val df = operators.JoinWindowQueries.joinRangeBucketed(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"),
      s"range join fell back to a nested loop:\n$plan")
    assert(df.count() == Tables.events(spark, sf).count())
    assert(df.select("event_id").distinct().count() == df.count())
  }

  test("cumulative distinct users: ONE window over the calendar-sized " +
    "aggregate (the first-seen reduction), never a data-sized sort") {
    val df = operators.JoinWindowQueries.winCumDistinct(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.split("Window \\[").length - 1 == 1,
      s"expected exactly one Window node:\n$plan")
    // monotone + exact: last cum equals the true distinct count
    val rows = df.collect()
    assert(rows.map(_.getLong(2)).sliding(2).forall {
      case Array(a, b) => a <= b; case _ => true })
    assert(rows.last.getLong(2) ==
      Tables.events(spark, sf).select("user_id").distinct().count())
  }

  test("phash media dedup: candidates come from an equi-join (no " +
    "cartesian/nested-loop fallback) and every emitted pair is within " +
    "the hamming radius") {
    val df = operators.MultimodalQueries.mmDedupPhash(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"phash blocking fell back to a cartesian:\n$plan")
    // the CANDIDATE join must be an equi hash join on the pigeonhole
    // keys — since round 18 the FUSED single-long form
    // (chunk_idx << 48 | chunk_val, DedupQueries.fusedChunkKey: a
    // LongHashedRelation probes ~8× faster than the two-column
    // UnsafeHashedRelation); the only nested-loop sites allowed are
    // the round-11 lazy cardinality probes (1-row count broadcasts
    // choosing the adaptive level — each BNLJ's build side must be
    // that zero-key count)
    assert(("(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) " +
      "\\[\\(shiftleft\\(cast\\(chunk_idx").r.findFirstIn(plan).isDefined,
      s"candidate join is not an equi join on the fused chunk key:\n$plan")
    val bnlj = plan.split("BroadcastNestedLoopJoin").length - 1
    val probeAggs = plan.split(
      java.util.regex.Pattern.quote("HashAggregate(keys=[], functions=[count("))
      .length - 1
    assert(bnlj <= probeAggs,
      s"nested-loop joins beyond the 1-row cardinality probes:\n$plan")
    assert(df.collect().forall(_.getInt(2) <= 3))
  }

  test("DCT pHash locality (the property the trigram-simhash stand-in " +
    "could not claim for pixel data): scattered byte noise keeps the " +
    "pair within the hamming radius; unrelated content re-draws ~half " +
    "the 60 bits; exact dup is hamming 0") {
    import spark.implicits._
    import graft.functions.DctPhash
    // deterministic pseudo-random "image" bytes (values < 200 so the
    // +1 noise below cannot wrap)
    def blob(seed: Long, n: Int): Array[Byte] =
      Array.tabulate(n)(i => (((i + 1) * (seed + 7919) * 2654435761L
        % 1000000007L) % 199L).toByte)
    val base = blob(1L, 400)
    val noisy = base.clone()
    for (k <- 0 until 400 by 40) noisy(k) = (noisy(k) + 1).toByte // 10 pixels ±1
    val other = blob(2L, 400)
    val media = Seq((1L, base), (2L, noisy), (3L, base), (4L, other))
      .toDF("doc_id", "data")
    val pairs = operators.MultimodalQueries.mmDedupPhashOn(media)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) == 0,
      s"exact dup pair missing or nonzero: $pairs")
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) <= 3,
      s"noisy near-dup pair lost: $pairs")
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated blob matched: $pairs")
    val redrawn = java.lang.Long.bitCount(
      DctPhash.compute(base) ^ DctPhash.compute(other))
    assert(redrawn >= 15 && redrawn <= 45,
      s"unrelated content should re-draw ~30 of 60 bits, got $redrawn")
    // interpreted path ≡ the compute() helper the codegen calls
    val viaExpr = media.where($"doc_id" === 1L)
      .select(DctPhash.dct_phash($"data")).head.getLong(0)
    assert(viaExpr == DctPhash.compute(base))
  }

  test("incremental phash admission: cross-batch exact copy flagged as " +
    "'corpus' at hamming 0, noisy batch blob matches both the corpus " +
    "original and its in-batch sibling (later doc at the earlier one), " +
    "unrelated batch blob stays silent; incremental == full pairs " +
    "restricted to batch-touching (direction-mapped)") {
    import spark.implicits._
    val MQ = operators.MultimodalQueries
    def blob(seed: Long, n: Int): Array[Byte] =
      Array.tabulate(n)(i => (((i + 1) * (seed + 7919) * 2654435761L
        % 1000000007L) % 199L).toByte)
    val base = blob(1L, 400)
    val noisy = base.clone()
    for (k <- 0 until 400 by 40) noisy(k) = (noisy(k) + 1).toByte
    val media = Seq(
      1L -> base,         // existing corpus
      3L -> blob(2L, 400), // existing, unrelated
      5L -> base.clone(),  // batch: exact copy of corpus doc 1
      10L -> noisy,        // batch: near-dup of 1 AND of in-batch 5
      15L -> blob(3L, 400) // batch: unrelated
    ).toDF("doc_id", "data")
    val got = MQ.incrementalPhashOn(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3)))
      .toSeq
    assert(got.contains((5L, 1L, "corpus", 0)),
      s"cross-batch exact copy not flagged: $got")
    assert(got.exists(t => t._1 == 10L && t._2 == 1L && t._3 == "corpus"
      && t._4 <= 3), s"noisy cross-batch near-dup lost: $got")
    assert(got.exists(t => t._1 == 10L && t._2 == 5L && t._3 == "batch"
      && t._4 <= 3), s"in-batch near pair lost or misdirected: $got")
    assert(!got.exists(t => t._1 == 15L || t._2 == 15L),
      s"unrelated batch blob matched: $got")
    assert(got.forall(_._1 % 5 == 0), s"existing doc on the batch side: $got")
    // equivalence with the full pair derivation: incremental == every
    // full hamming<=3 pair touching the batch, direction-mapped
    val full = MQ.mmDedupPhashOn(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val expected = full.flatMap { case (a, b, ham) =>
      val (aB, bB) = (a % 5 == 0, b % 5 == 0)
      if (aB && bB) Some((b, a, "batch", ham))
      else if (aB) Some((a, b, "corpus", ham))
      else if (bB) Some((b, a, "corpus", ham))
      else None
    }.toSet
    assert(got.toSet == expected,
      s"incremental diverged from batch-touching full pairs:\n$got\n$expected")
  }

  test("heap top-k ≡ window top-k row-for-row, with NO Window node — " +
    "partial aggregation bounds the shuffle to k entries per group per " +
    "partition") {
    val heap = plans.TopK.topkHeapPerGroup(spark, sf)
    val window = operators.JoinWindowQueries.topkHeadPerGroup(spark, sf)
    val plan = heap.queryExecution.executedPlan.toString
    assert(!plan.contains("Window ["),
      s"heap form must not rank via a window:\n$plan")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected a typed aggregate:\n$plan")
    assert(heap.collect().toSeq == window.collect().toSeq,
      "the two physical strategies must be result-identical")
  }

  test("co-bucketed fact join is shuffle-free (no exchange under the join)") {
    // broadcast would hide the bucket layout at test SF — force SMJ,
    // which is what a 100 TB fact-fact join uses
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (oTbl, lTbl) = sources.SourceQueries.bucketedTables(spark, sf)
      val o = spark.table(oTbl)
      val l = spark.table(lTbl)
      val joined = l.join(o, l("l_orderkey") === o("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"expected shuffle-free co-bucketed join:\n$plan")
      // and the layout must not change results
      assert(joined.count() == Tables.lineitem(spark, sf).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("runtime bloom filter: a selective dim-side predicate injects a " +
    "bloom probe into the fact scan of a shuffle join") {
    // The 100 TB shape this guards: fact ⋈ σ(dim) where the dim
    // predicate is selective — Spark builds a bloom filter from the
    // filtered dim keys and probes it INSIDE the fact scan stage, so
    // non-matching fact rows die before the shuffle instead of after
    // it. Defaults only fire above 10 GB scans; the thresholds here are
    // lowered so the test SF exercises the same rule the cluster uses.
    val prevs = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val o = Tables.orders(spark, sf)
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderpriority"))
      val l = Tables.lineitem(spark, sf)
      val joined = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected an injected bloom probe on the fact side:\n$optimized")
      // the filter must not change results vs the plain join
      val n = joined.collect().map(r => r.getLong(1)).sum
      val expected = l.join(
          Tables.orders(spark, sf)
            .where(col("o_orderpriority") === "1-URGENT")
            .select("o_orderkey"),
          l("l_orderkey") === col("o_orderkey"))
        .count()
      assert(n == expected, s"bloom-filtered join changed results: $n vs $expected")
    } finally prevs.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("scd2: a value recurring after a change opens a NEW interval " +
    "(never merged back), valid_to chains to the next run's valid_from, " +
    "same-date changes order by orderkey") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val log = Seq(
      // cust 1: A,A,B,A — the trailing A must be a THIRD interval
      (1L, ts("2024-01-01"), 10L, "A"),
      (1L, ts("2024-01-02"), 11L, "A"),
      (1L, ts("2024-01-03"), 12L, "B"),
      (1L, ts("2024-01-04"), 13L, "A"),
      // cust 2: two changes on the SAME date — orderkey decides
      (2L, ts("2024-01-01"), 20L, "B"),
      (2L, ts("2024-01-01"), 21L, "A"),
    ).toDF("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority")
    val got = operators.JoinWindowQueries.scd2On(log)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getLong(5)))
      .toList
    assert(got == List(
      (1L, 1L, "A", ts("2024-01-01"), Some(ts("2024-01-03")), 2L),
      (1L, 2L, "B", ts("2024-01-03"), Some(ts("2024-01-04")), 1L),
      (1L, 3L, "A", ts("2024-01-04"), None, 1L),
      (2L, 1L, "B", ts("2024-01-01"), Some(ts("2024-01-01")), 1L),
      (2L, 2L, "A", ts("2024-01-01"), None, 1L)))
  }

  test("scd2 plan: lag, island sum, run collapse, and valid_to lead all " +
    "ride ONE custkey hash partitioning") {
    val df = operators.JoinWindowQueries.dimScd2History(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // one hash exchange for the whole build; the trailing range
    // exchange is the final presentation orderBy, not a rebuild
    val nHash = "hashpartitioning".r.findAllIn(plan).size
    assert(nHash == 1,
      s"expected exactly 1 hash exchange (o_custkey), got $nHash:\n$plan")
  }

  test("range interval frame: after a 9-day gap the 7-day window holds " +
    "only the current day — a ROWS frame would leak pre-gap revenue") {
    import spark.implicits._
    val daily = Seq(
      ("P", "1992-01-01", 1.00),
      ("P", "1992-01-02", 2.00),
      ("P", "1992-01-11", 4.00),  // 9-day gap: frame must reset
    ).toDF("product", "d", "total_revenue")
      .select(col("product"), col("d").cast("date").as("sale_date"),
        col("total_revenue"))
    val got = operators.JoinWindowQueries.rangeIntervalOn(daily)
      .collect().map(r => (r.getDate(1).toString, r.getDouble(2),
        r.getLong(3))).toList
    assert(got == List(
      ("1992-01-01", 1.00, 1L),
      ("1992-01-02", 3.00, 2L),
      ("1992-01-11", 4.00, 1L)))
  }
}
