package graft.spider.state

import java.nio.file.{Files, StandardCopyOption}

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.SparkSession

/** Second snapshot-store implementation — proves the IceLite manifest seam
  * (VERDICT r4 "smaller" task): the data-file layout, staged commit
  * protocol, incremental compaction and expiration ordering are inherited
  * from [[CrawlCatalog]] untouched; ONLY the six manifest-persistence seam
  * methods differ. Model: Iceberg's single metadata.json lineage — every
  * commit atomically replaces ONE document holding all live snapshot
  * manifests plus the expiration rollup, instead of CrawlCatalog's
  * one-JSON-file-per-round. A catalog that passes the conformance spec
  * under both stores demonstrates a real Iceberg catalog can substitute
  * without touching the engine (SURVEY.md §2.1's swap stance).
  *
  * Same atomicity contract as the base: a killed writer leaves either the
  * old or the new metadata document visible (tmp write + ATOMIC_MOVE),
  * never a torn one; a fresh instance re-reads the document, so resume
  * works across processes.
  */
class SingleFileCatalog(root0: String, spark0: SparkSession)
    extends CrawlCatalog(root0, spark0) {

  private def metaPath = snapDir.resolve("metadata.json")

  private val doc: ObjectNode =
    if (Files.exists(metaPath))
      mapper.readTree(metaPath.toFile).asInstanceOf[ObjectNode]
    else {
      val d = mapper.createObjectNode()
      d.putObject("snapshots")
      d
    }

  private def persistDoc(): Unit = {
    val tmp = snapDir.resolve(".tmp-metadata.json")
    Files.writeString(tmp,
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(doc))
    Files.move(tmp, metaPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def snaps: ObjectNode = doc.get("snapshots").asInstanceOf[ObjectNode]

  override def latestRound: Option[Int] = synchronized {
    val it = snaps.fieldNames()
    var max = -1
    while (it.hasNext) max = math.max(max, it.next().toInt)
    if (max < 0) None else Some(max)
  }

  override protected def loadManifestNode(round: Int): JsonNode = synchronized {
    val n = snaps.get(round.toString)
    if (n == null) throw new java.io.FileNotFoundException(
      s"no snapshot $round in $metaPath")
    n
  }

  override protected def persistManifestNode(round: Int, json: String): Unit =
    synchronized {
      snaps.set[JsonNode](round.toString, mapper.readTree(json))
      persistDoc()
    }

  override protected def manifestExists(round: Int): Boolean = synchronized {
    snaps.has(round.toString)
  }

  override protected def deleteManifest(round: Int): Unit = synchronized {
    // Expiration sweeps re-visit already-swept rounds (the sweep always
    // walks 0..through); rewriting the whole document for a key that is
    // not present would make a long crawl's sweeps O(rounds²) full-JSON
    // writes. Persist only when the document actually changed.
    if (snaps.remove(round.toString) != null) persistDoc()
  }

  override protected def loadExpiredNode(): Option[JsonNode] = synchronized {
    Option(doc.get("expired"))
  }

  override protected def persistExpiredNode(json: String): Unit = synchronized {
    doc.set[JsonNode]("expired", mapper.readTree(json))
    persistDoc()
  }
}
