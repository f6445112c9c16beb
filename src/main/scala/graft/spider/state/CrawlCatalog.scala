package graft.spider.state

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.spider.core.RoundCounters

/** "IceLite" — an Iceberg-style snapshot layer over Parquet (SURVEY.md §2.1
  * S5-S7, §4.4). This sandbox ships no Iceberg runtime jar, so crawl state
  * (frontier, seen set, per-host politeness clocks, crawled output, seen-set
  * sketches) checkpoints to immutable per-round parquet directories plus
  * numbered JSON snapshot manifests carrying per-partition lineage and
  * counters. Commit = write temp manifest + ATOMIC_MOVE rename; readers
  * resolve `latest` = max valid manifest, so a killed run leaves no visible
  * partial state and resume replays from the last committed round.
  *
  * The interface is deliberately narrow so a real Iceberg catalog can be
  * substituted without touching the engine.
  */
class CrawlCatalog(val root: String, spark: SparkSession) {

  private val mapper = new ObjectMapper()
  private def snapDir: Path = Paths.get(root, "snapshots")
  private def dataDir(table: String, round: Int): String =
    s"$root/$table/data/r${"%05d".format(round)}"
  private def bloomPath(round: Int): Path =
    Paths.get(root, "sketches", s"round-${"%05d".format(round)}.bloom.bin")
  private def manifestPath(round: Int): Path =
    snapDir.resolve(s"snapshot-${"%05d".format(round)}.json")

  Files.createDirectories(snapDir)
  Files.createDirectories(Paths.get(root, "sketches"))

  /** Highest round with a committed (atomic-renamed) manifest. */
  def latestRound: Option[Int] = {
    if (!Files.isDirectory(snapDir)) return None
    val stream = Files.list(snapDir)
    val rs =
      try stream.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("snapshot-") && s.endsWith(".json") =>
          s.stripPrefix("snapshot-").stripSuffix(".json").toInt }
        .toSeq
      finally stream.close()
    if (rs.isEmpty) None else Some(rs.max)
  }

  def manifest(round: Int): JsonNode = mapper.readTree(manifestPath(round).toFile)

  /** Write one table's round delta/state and return (rows, per-partition
    * lineage). Lineage comes from the parquet file footers (one data file per
    * write partition) — driver-side metadata only, no extra Spark job; the
    * same way an Iceberg manifest records per-file row counts. */
  private def writeTable(table: String, round: Int, df: DataFrame): (Long, Seq[(Int, Long)]) = {
    val dir = dataDir(table, round)
    df.write.mode("overwrite").parquet(dir)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(st => st.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName)
      .map { st =>
        val pid = st.getPath.getName.stripPrefix("part-").takeWhile(_.isDigit).toInt
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try (pid, reader.getRecordCount) finally reader.close()
      }.toSeq
    (parts.map(_._2).sum, parts)
  }

  /** Commit round state atomically. `frontier`/`hostState` are full states;
    * `seenDelta`/`crawledDelta` are per-round appends. */
  def commitRound(
      round: Int,
      frontier: DataFrame,
      seenDelta: DataFrame,
      hostState: DataFrame,
      crawledDelta: Option[DataFrame],
      bloomBytes: Option[Array[Byte]],
      counters: RoundCounters): Unit = {

    val node = mapper.createObjectNode()
    node.put("snapshot_id", round)
    node.put("parent_id", round - 1)
    node.put("round", round)

    val tables = node.putObject("tables")
    val verbose = sys.env.contains("GRAFT_COMMIT_VERBOSE")
    def timed[A](name: String)(body: => A): A = {
      val t = System.nanoTime()
      val r = body
      if (verbose) System.err.println(
        f"[commit] $name ${(System.nanoTime() - t) / 1e9}%.1fs")
      r
    }
    def record(name: String, stats: (Long, Seq[(Int, Long)])): Unit = {
      val t = tables.putObject(name)
      t.put("path", dataDir(name, round))
      t.put("rows", stats._1)
      val arr = t.putArray("partitions")
      stats._2.foreach { case (pid, rows) =>
        val p = arr.addObject(); p.put("pid", pid); p.put("rows", rows)
      }
    }
    // The four table writes are independent jobs over already-persisted
    // parents — submit them concurrently (the manifest rename below remains
    // the single atomic commit point, so concurrency never weakens atomicity).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val writes: Seq[(String, Future[(Long, Seq[(Int, Long)])])] = Seq(
      "frontier" -> Future(timed("frontier")(writeTable("frontier", round, frontier))),
      "seen" -> Future(timed("seen")(writeTable("seen", round, seenDelta))),
      "hoststate" -> Future(timed("hoststate")(writeTable("hoststate", round, hostState)))) ++
      crawledDelta.map(df =>
        "crawled" -> Future(timed("crawled")(writeTable("crawled", round, df)))).toSeq
    writes.foreach { case (name, f) => record(name, Await.result(f, Duration.Inf)) }

    bloomBytes.foreach { bytes =>
      val tmp = bloomPath(round).resolveSibling(bloomPath(round).getFileName.toString + ".tmp")
      Files.write(tmp, bytes)
      Files.move(tmp, bloomPath(round), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      node.put("bloom", bloomPath(round).toString)
    }

    val c: ObjectNode = node.putObject("counters")
    c.put("frontier_in", counters.frontier_in)
    c.put("robots_blocked", counters.robots_blocked)
    c.put("dequeued", counters.dequeued)
    c.put("fetched", counters.fetched)
    c.put("fetch_missing", counters.fetch_missing)
    c.put("links_extracted", counters.links_extracted)
    c.put("candidates_new", counters.candidates_new)
    c.put("deduped_seen", counters.deduped_seen)
    c.put("enqueued", counters.enqueued)
    c.put("frontier_out", counters.frontier_out)

    val tmp = snapDir.resolve(s".tmp-snapshot-$round.json")
    Files.writeString(tmp, mapper.writerWithDefaultPrettyPrinter().writeValueAsString(node))
    Files.move(tmp, manifestPath(round), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def countersOf(round: Int): RoundCounters = {
    val c = manifest(round).get("counters")
    RoundCounters(round,
      c.get("frontier_in").asLong(), c.get("robots_blocked").asLong(),
      c.get("dequeued").asLong(), c.get("fetched").asLong(),
      c.get("fetch_missing").asLong(), c.get("links_extracted").asLong(),
      c.get("candidates_new").asLong(), c.get("deduped_seen").asLong(),
      c.get("enqueued").asLong(), c.get("frontier_out").asLong())
  }

  def readFrontier(round: Int): DataFrame =
    spark.read.parquet(manifest(round).get("tables").get("frontier").get("path").asText())

  def readHostState(round: Int): DataFrame =
    spark.read.parquet(manifest(round).get("tables").get("hoststate").get("path").asText())

  /** Seen set = union of committed per-round deltas 0..round. */
  def readSeen(round: Int): DataFrame = {
    val paths = (0 to round)
      .map(r => manifest(r).get("tables").get("seen").get("path").asText())
    spark.read.parquet(paths: _*)
  }

  /** Crawled output accumulated through `round` (round 0 commits none). */
  def readCrawled(round: Int): DataFrame = {
    val paths = (1 to round).flatMap { r =>
      val t = manifest(r).get("tables").get("crawled")
      if (t == null) None else Some(t.get("path").asText())
    }
    require(paths.nonEmpty, s"no crawled data through round $round")
    spark.read.parquet(paths: _*)
  }

  def readBloom(round: Int): Option[Array[Byte]] = {
    val m = manifest(round)
    if (m.has("bloom")) Some(Files.readAllBytes(Paths.get(m.get("bloom").asText()))) else None
  }
}
