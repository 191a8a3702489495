package graft.hudi

import com.fasterxml.jackson.databind.ObjectMapper

import scala.jdk.CollectionConverters._

/** Parsed rollback-instant metadata: which commits were revoked and
  * which data files that deleted, per partition (the shape of Hudi's
  * HoodieRollbackMetadata — ref
  * `core/.../hudi/HudiDataFileExtractor.java:207-223` deserializes it
  * and feeds `successDeleteFiles` into the change feed as removals). */
final case class HudiRollbackMetadata(
    commitsRollback: Seq[String],
    partitionToDeleteFiles: Map[String, Seq[String]],
    /** rolled-back instant time -> its ACTION (real Hudi's
      * `instantsRollback` HoodieInstantInfo) — lets a replay tell a
      * removal-only append rollback from a replace rollback that
      * REVIVES files a removal-only replay cannot express. Empty for
      * legacy/foreign JSONs lacking the field. */
    instantActions: Map[String, String] = Map.empty) {
  def deletedFiles: Seq[String] = partitionToDeleteFiles.values.flatten.toSeq
  /** True when a removal-only replay is provably sufficient: every
    * rolled-back instant is KNOWN to be a pure-add commit. */
  def removalOnlyReplayable: Boolean =
    commitsRollback.forall(t =>
      instantActions.get(t).exists(a => a == "commit" || a == "deltacommit"))
}

/** Restore = an ordered series of rollbacks down to a restore point
  * (HoodieRestoreMetadata shape — ref
  * `core/.../hudi/HudiDataFileExtractor.java:224-243` flattens every
  * nested rollback's deleted files into removals). */
final case class HudiRestoreMetadata(
    restoreToInstant: String,
    instantsToRollback: Seq[String],
    rollbacks: Seq[HudiRollbackMetadata]) {
  def deletedFiles: Seq[String] = rollbacks.flatMap(_.deletedFiles)
}

/** Clean-instant metadata: files whose removal is now recorded on the
  * timeline plus the earliest commit whose files are all still present
  * — the incremental-sync retention fence reads `earliestCommitToRetain`
  * (ref `core/.../hudi/HudiClient.java:152-177`; emitted on the sync
  * target by `core/.../hudi/HudiTargetClient.java:414-536`). */
final case class HudiCleanMetadata(
    earliestCommitToRetain: String,
    partitionToDeleteFiles: Map[String, Seq[String]]) {
  def deletedFiles: Seq[String] = partitionToDeleteFiles.values.flatten.toSeq
}

/** Savepoint-instant metadata: the data instant it guards and the files
  * live at that instant, per partition (HoodieSavepointMetadata shape:
  * savepointedAt + partitionMetadata.savepointDataFile). Rollback,
  * restore, and archival must leave savepointed history untouched; the
  * sync backlog excludes savepoints entirely (ref
  * `core/.../hudi/HudiClient.java:233-252`). */
final case class HudiSavepointMetadata(
    savepointedAt: String,
    partitionToFiles: Map[String, Seq[String]]) {
  def files: Seq[String] = partitionToFiles.values.flatten.toSeq
}

/**
 * Jackson codecs for the maintenance-instant JSON shapes. Field
 * names follow the Hudi avro record fields (commitsRollback,
 * partitionMetadata.successDeleteFiles, earliestCommitToRetain, …) so
 * the files read like their native counterparts.
 */
object HudiMaintenanceCodec {
  private val mapper = new ObjectMapper()

  // ------------------------------------------------------------- rollback

  def rollbackToJson(startTime: String, m: HudiRollbackMetadata): String = {
    val root = mapper.createObjectNode()
    root.put("startRollbackTime", startTime)
    root.put("totalFilesDeleted", m.deletedFiles.size)
    val cr = root.putArray("commitsRollback")
    m.commitsRollback.foreach(cr.add)
    val ir = root.putArray("instantsRollback")
    m.commitsRollback.foreach { t =>
      val n = ir.addObject()
      n.put("commitTime", t)
      m.instantActions.get(t).foreach(a => n.put("action", a))
    }
    val pm = root.putObject("partitionMetadata")
    m.partitionToDeleteFiles.toSeq.sortBy(_._1).foreach { case (pp, files) =>
      val n = pm.putObject(pp)
      n.put("partitionPath", pp)
      val ok = n.putArray("successDeleteFiles")
      files.foreach(ok.add)
      n.putArray("failedDeleteFiles")
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def rollbackFromJson(json: String): HudiRollbackMetadata = {
    val root = mapper.readTree(json)
    val commits = Option(root.get("commitsRollback")).toSeq
      .flatMap(_.elements().asScala.map(_.asText()))
    val parts = Option(root.get("partitionMetadata")).map { node =>
      node.properties().asScala.map { e =>
        e.getKey -> Option(e.getValue.get("successDeleteFiles")).toSeq
          .flatMap(_.elements().asScala.map(_.asText()))
      }.toMap
    }.getOrElse(Map.empty)
    val actions = Option(root.get("instantsRollback")).toSeq
      .flatMap(_.elements().asScala)
      .flatMap { n =>
        for {
          t <- Option(n.get("commitTime")).map(_.asText())
          a <- Option(n.get("action")).map(_.asText())
        } yield t -> a
      }.toMap
    HudiRollbackMetadata(commits, parts, actions)
  }

  // -------------------------------------------------------------- restore

  def restoreToJson(startTime: String, m: HudiRestoreMetadata): String = {
    val root = mapper.createObjectNode()
    root.put("startRestoreTime", startTime)
    root.put("restoreToInstant", m.restoreToInstant)
    val ir = root.putArray("instantsToRollback")
    m.instantsToRollback.foreach(ir.add)
    val rb = root.putArray("hudiRestoreMetadata")
    m.rollbacks.foreach(r => rb.add(mapper.readTree(rollbackToJson(startTime, r))))
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def restoreFromJson(json: String): HudiRestoreMetadata = {
    val root = mapper.readTree(json)
    val instants = Option(root.get("instantsToRollback")).toSeq
      .flatMap(_.elements().asScala.map(_.asText()))
    val rollbacks = Option(root.get("hudiRestoreMetadata")).toSeq
      .flatMap(_.elements().asScala.map(n => rollbackFromJson(n.toString)))
    HudiRestoreMetadata(
      restoreToInstant = Option(root.get("restoreToInstant")).map(_.asText()).getOrElse(""),
      instantsToRollback = instants,
      rollbacks = rollbacks)
  }

  // ---------------------------------------------------------------- clean

  def cleanToJson(startTime: String, m: HudiCleanMetadata): String = {
    val root = mapper.createObjectNode()
    root.put("startCleanTime", startTime)
    root.put("earliestCommitToRetain", m.earliestCommitToRetain)
    root.put("totalFilesDeleted", m.deletedFiles.size)
    val pm = root.putObject("partitionMetadata")
    m.partitionToDeleteFiles.toSeq.sortBy(_._1).foreach { case (pp, files) =>
      val n = pm.putObject(pp)
      n.put("partitionPath", pp)
      n.put("policy", "KEEP_LATEST_COMMITS")
      val pat = n.putArray("deletePathPatterns")
      files.foreach(pat.add)
      val ok = n.putArray("successDeleteFiles")
      files.foreach(ok.add)
      n.putArray("failedDeleteFiles")
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def cleanFromJson(json: String): HudiCleanMetadata = {
    val root = mapper.readTree(json)
    val parts = Option(root.get("partitionMetadata")).map { node =>
      node.properties().asScala.map { e =>
        e.getKey -> Option(e.getValue.get("successDeleteFiles")).toSeq
          .flatMap(_.elements().asScala.map(_.asText()))
      }.toMap
    }.getOrElse(Map.empty)
    HudiCleanMetadata(
      earliestCommitToRetain =
        Option(root.get("earliestCommitToRetain")).map(_.asText()).getOrElse(""),
      partitionToDeleteFiles = parts)
  }

  // ------------------------------------------------------------ savepoint

  def savepointToJson(m: HudiSavepointMetadata): String = {
    val root = mapper.createObjectNode()
    root.put("savepointedAt", m.savepointedAt)
    root.put("savepointedBy", "graft")
    val pm = root.putObject("partitionMetadata")
    m.partitionToFiles.toSeq.sortBy(_._1).foreach { case (pp, files) =>
      val n = pm.putObject(pp)
      n.put("partitionPath", pp)
      val arr = n.putArray("savepointDataFile")
      files.foreach(arr.add)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def savepointFromJson(json: String): HudiSavepointMetadata = {
    val root = mapper.readTree(json)
    val parts = Option(root.get("partitionMetadata")).map { node =>
      node.properties().asScala.map { e =>
        e.getKey -> Option(e.getValue.get("savepointDataFile")).toSeq
          .flatMap(_.elements().asScala.map(_.asText()))
      }.toMap
    }.getOrElse(Map.empty)
    HudiSavepointMetadata(
      savepointedAt = Option(root.get("savepointedAt")).map(_.asText()).getOrElse(""),
      partitionToFiles = parts)
  }
}
