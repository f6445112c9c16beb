package graft.spider.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

import graft.spider.CrawlEngine
import graft.spider.core.{CrawlConfig, Hash64}
import graft.datapipe.Dedup

/** Plan audit for the round-5 operators — verifies the scale claims their
  * scaladoc makes on real executed plans (AQE off for a deterministic
  * static shape):
  *
  *  1. capPerHost (O4, two-phase): the admission cap compiles to exactly
  *     TWO window operators — salted pre-rank partitioned by (host, salt)
  *     below the exact per-host rank — with the `__adm_pre <= K` filter
  *     between them, so the exact window's input is bounded at S·K rows
  *     per host no matter how large a trap host's round discovery set is.
  *     Enforced with a tree walk over WindowExec partition specs.
  *  2. mirrorHosts (§8): the fingerprint self-join consumes the
  *     frequency-gated frame on BOTH sides — the `2 <= count <= cap`
  *     filter sits strictly below the self-join, so no fingerprint group
  *     wider than the cap ever reaches the pairing (the stopword-
  *     fingerprint hazard), and the plan contains no cartesian or
  *     broadcast-nested-loop join.
  *
  *   runMain graft.spider.tools.R5PlanAudit <sfDir> <outFile>
  */
object R5PlanAudit {

  private def windows(p: SparkPlan): Seq[WindowExec] = p.collect { case w: WindowExec => w }

  private def shuffles(p: SparkPlan): Seq[ShuffleExchangeLike] =
    p.collect { case s: ShuffleExchangeLike => s }

  private def fmt(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outFile = if (args.length > 1) args(1) else "/tmp/r5-plans.md"

    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.driver.bindAddress", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val sb = new StringBuilder
    sb.append("# Round-5 operator plans (capPerHost two-phase, mirrorHosts)\n\n")

    // ---- 1. two-phase admission cap over a mega-skewed discovery round ----
    val rows = (0 until 5000).map { i =>
      (s"http://trap.example/p$i", Hash64.string(s"http://trap.example/p$i"),
        "trap.example", 5 - (i % 3), 1700000000000000L + (i % 7).toLong)
    } ++ (0 until 60).map { i =>
      (s"http://ok${i % 6}.example/p$i", Hash64.string(s"http://ok$i"),
        s"ok${i % 6}.example", 5, 1700000000000000L + i.toLong)
    }
    val newEntries = rows.toDF("url", "url_hash", "host", "priority", "ts")
      .withColumn("warc_ts", timestamp_micros(col("ts"))).drop("ts")
    val cfg = CrawlConfig(maxNewPerHost = 3, twoPhaseDequeue = true, saltFactor = 4)
    val capped = CrawlEngine.capPerHost(newEntries, cfg)
    capped.count() // execute so executedPlan is final
    val capPlan = capped.queryExecution.executedPlan

    val ws = windows(capPlan)
    assert(ws.length == 2, s"expected 2 WindowExec, got ${ws.length}")
    // bottom-most window = salted pre-rank: partition spec has 2 exprs
    // (host, pmod(url_hash, S)); top window = exact per-host rank: 1 expr.
    val specs = ws.map(_.partitionSpec.length).sorted
    assert(specs == Seq(1, 2), s"window partition-spec widths: $specs")
    val salted = ws.find(_.partitionSpec.length == 2).get
    val exact = ws.find(_.partitionSpec.length == 1).get
    // the exact window must be an ANCESTOR of the salted window (phase order)
    assert(exact.collect { case w: WindowExec if w eq salted => w }.nonEmpty,
      "exact window is not above the salted pre-rank")
    // and a Filter must sit strictly between them (the <= K bound)
    val between = exact.collectFirst {
      case f: org.apache.spark.sql.execution.FilterExec
        if f.collect { case w: WindowExec if w eq salted => w }.nonEmpty &&
          f.condition.sql.contains("__adm_pre") => f
    }
    assert(between.nonEmpty, "no __adm_pre <= K filter between the two windows")
    // exactly two exchanges: hashpartitioning(host, salt) then hashpartitioning(host)
    val exs = shuffles(capPlan)
    assert(exs.length == 2, s"expected 2 exchanges, got ${exs.length}")
    sb.append("## capPerHost (two-phase, maxNewPerHost=3, saltFactor=4) over a " +
      "5000-row trap host (VERIFIED: salted (host,salt) pre-rank window below " +
      "the exact host window, __adm_pre<=K filter between them, exactly two " +
      "exchanges — the exact window's input is <= S*K rows per host)\n\n```\n")
    sb.append(fmt(capped)).append("\n```\n\n")

    // ---- 2. mirrorHosts frequency gate below the fingerprint self-join ----
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(concat(lit("h"), pmod(col("doc_id"), lit(50L))).as("host"), col("text"))
    val mirrors = Dedup.mirrorHosts(docs, "host", "text")
    mirrors.count()
    val mPlan = mirrors.queryExecution.executedPlan
    // no cartesian / nested-loop pairing
    assert(mPlan.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, "cartesian join in mirrorHosts plan")
    assert(mPlan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.isEmpty, "nested-loop join in mirrorHosts plan")
    // the self-join's BOTH inputs must contain the frequency-gate filter
    // (count >= 2 AND count <= cap) strictly below the join. Catalyst
    // computes the gated frame ONCE and reuses its exchange on the other
    // side (ReusedExchange — itself the right plan: the gate is not paid
    // twice), so the walk follows ReusedExchangeExec.child.
    def containsGate(p: SparkPlan): Boolean = {
      val here = p match {
        case f: org.apache.spark.sql.execution.FilterExec =>
          f.condition.sql.contains(">= 2")
        case _ => false
      }
      val kids = p match {
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
        case o => o.children
      }
      here || kids.exists(containsGate)
    }
    // the pairing join: fp-keyed with the host_a < host_b residual condition
    val selfJoin = mPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
        if j.leftKeys.exists(_.sql.contains("fp")) &&
          j.condition.exists(_.sql.contains("<")) &&
          j.children.forall(containsGate) => j
    }
    assert(selfJoin.nonEmpty,
      "no fp self-join with the frequency gate below BOTH sides")
    sb.append("## mirrorHosts over sf documents, 50 synthetic hosts " +
      "(VERIFIED: no cartesian/nested-loop join; the 2<=count<=cap frequency " +
      "gate sits below BOTH sides of the fingerprint self-join, so no " +
      "fingerprint group wider than maxHostsPerFp reaches the pairing)\n\n```\n")
    sb.append(fmt(mirrors)).append("\n```\n")

    // ---- 3. corpus_pipeline: single-pass collapse, join-free, gates in the
    // scan stage. The dedup collapse is min_by(struct, doc_id) — its struct
    // buffer keeps it off the hash map (SortAggregateExec), but the partial
    // mode sits BELOW the exchange, so a boilerplate page duplicated 10^6
    // times still combines to one row per map task before any shuffle, and
    // the pre-agg sort keys on the 8-byte xxhash64 (radix-sortable,
    // spillable). The alternative — pure hash-agg on min(doc_id) plus a
    // join back for the rep's attributes — would shuffle the gated corpus
    // twice; one sorted pass wins at scale.
    val pipe = graft.queries.Demos.queries("corpus_pipeline")(spark, sfDir)
    pipe.count()
    val pPlan = pipe.queryExecution.executedPlan
    // join-free end to end
    assert(pPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty, "corpus_pipeline plan contains a join")
    // exactly 3 exchanges: collapse key, source rollup, presentation sort
    val pexs = shuffles(pPlan)
    assert(pexs.length == 3, s"expected 3 exchanges, got ${pexs.length}")
    val pparts = pexs.map(_.outputPartitioning.getClass.getSimpleName).sorted
    assert(pparts == Seq("HashPartitioning", "HashPartitioning", "RangePartitioning"),
      s"exchange partitionings: $pparts")
    // the collapse's PARTIAL aggregate lives in the scan stage: its subtree
    // has the corpus scans and the gate filters but NO exchange (map-side
    // combine really happens before the first shuffle)
    import org.apache.spark.sql.execution.aggregate.{BaseAggregateExec, SortAggregateExec}
    import org.apache.spark.sql.catalyst.expressions.aggregate.Partial
    val partialCollapse = pPlan.collect {
      case a: SortAggregateExec
        if a.aggregateExpressions.exists(_.mode == Partial) => a
    }
    assert(partialCollapse.nonEmpty, "no partial-mode collapse aggregate")
    partialCollapse.foreach { a =>
      assert(shuffles(a).isEmpty, "exchange below the partial collapse agg")
      assert(a.collect {
        case f: org.apache.spark.sql.execution.FilterExec => f
      }.nonEmpty, "lang/quality gate filter not below the partial collapse")
      assert(a.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.nonEmpty, "corpus scan not in the partial collapse stage")
    }
    // the per-source rollup is a hash agg (primitive buffers) with its own
    // partial mode below its exchange
    val rollupAggs = pPlan.collect {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
    }
    assert(rollupAggs.exists(_.aggregateExpressions.exists(_.mode == Partial)),
      "source rollup has no map-side partial hash agg")
    val aggKinds = pPlan.collect {
      case a: BaseAggregateExec =>
        a.getClass.getSimpleName + "(" +
          a.aggregateExpressions.map(_.mode).distinct.mkString(",") + ")"
    }
    sb.append("## corpus_pipeline (composed cleaning pass: lang gate → " +
      "quality gate → exact-dedup collapse → per-source report) over sf " +
      "documents + injected copies (VERIFIED: join-free; exactly three " +
      "exchanges — collapse key, source rollup, presentation sort; the " +
      "min_by collapse runs PARTIAL below the first exchange with the gate " +
      "filters and the parquet scans in the same stage, so exact-duplicate " +
      "floods combine map-side; aggregates: " + aggKinds.mkString(", ") +
      ")\n\n```\n")
    sb.append(fmt(pipe)).append("\n```\n")

    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"wrote $outFile (all assertions passed)")
    spark.stop()
  }
}
