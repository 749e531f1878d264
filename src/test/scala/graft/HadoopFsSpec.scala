package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.store._

/** The store matrix over the Hadoop `FileSystem` backend (`file:`
  * scheme — the same code path a cluster store at `hdfs:`/`s3a:` runs,
  * exercised against the local filesystem): write / filtered read /
  * append with dedup / snapshot / delete / lock all through
  * `HadoopFs`, asserting the results match what the POSIX backend
  * produces for the same inputs.
  */
class HadoopFsSpec extends SparkSpec {
  import spark.implicits._

  /** Store rooted one level below the temp dir, so cleanup of
    * `c.path.parent.parent` removes the temp dir and nothing above it. */
  private def hadoopCollection(tag: String): Collection = {
    val root = Files.createTempDirectory(s"graft_hfs_$tag")
    val store = GraftStore.at(spark, "file:" + root.resolve("s").toString)
    store.collection("c")
  }

  test("GraftStore.at picks the Hadoop backend for URIs, POSIX otherwise") {
    val root = Files.createTempDirectory("graft_hfs_pick")
    val h = GraftStore.at(spark, "file:" + root.toString)
    assert(h.path.fs.isInstanceOf[HadoopFs])
    val n = GraftStore.at(spark, root.toString)
    assert(n.path.fs == NioFs)
    FsOps.deleteRecursively(root)
  }

  test("write → filtered read over file: matches the POSIX backend") {
    val df = sampleData
    val hc = hadoopCollection("write_read")
    val nc = tempCollection("hfs_ref")
    hc.write("it", df, indexCols = Seq("index"))
    nc.write("it", df, indexCols = Seq("index"))
    val pred = Seq(Filters.Pred("value1", ">", 0.0))
    val h = hc.item("it", filters = pred).data.orderBy($"index").collect().toSeq
    val n = nc.item("it", filters = pred).data.orderBy($"index").collect().toSeq
    assert(h == n)
    assert(h.nonEmpty)
    hc.path.parent.parent.deleteRecursively()
    cleanup(nc)
  }

  test("append keep_last dedups through the Hadoop backend") {
    val c = hadoopCollection("append")
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("index", "v")
    c.write("it", base, indexCols = Seq("index"))
    c.append("it", Seq((3L, "C2"), (4L, "d")).toDF("index", "v"),
      duplicateHandling = DuplicateHandling.KeepLast)
    val got = c.item("it").data.orderBy($"index")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "C2"), (4L, "d")))
    c.path.parent.parent.deleteRecursively()
  }

  test("snapshot survives deleting the live item (Hadoop backend)") {
    val c = hadoopCollection("snap")
    c.write("it", sampleData, indexCols = Seq("index"))
    val snap = c.createSnapshot(Some("s1"))
    val before = c.item("it").data.count()
    c.deleteItem("it")
    assert(!c.hasItem("it"))
    val restored = c.item("it", snapshot = Some(snap)).data.count()
    assert(restored == before && restored > 0)
    c.path.parent.parent.deleteRecursively()
  }

  test("metadata sidecar round-trips through writeBytesAtomic") {
    val c = hadoopCollection("meta")
    c.write("it", sampleData, indexCols = Seq("index"),
      metadata = Map("source" -> "hfs-test", "version" -> 3L))
    c.clearMetadataCache()
    val m = c.metadata("it")
    assert(Meta.unjv(m("source")) == "hfs-test")
    assert(Meta.unjv(m("version")) == 3L)
    assert(c.listItems(Map("source" -> "hfs-test")) == Set("it"))
    c.path.parent.parent.deleteRecursively()
  }

  test("transaction backup + rollback are rename-only (same inodes, no copies)") {
    import graft.transactions.Transaction
    val hc = hadoopCollection("txn_pins")
    hc.write("it", sampleData, indexCols = Seq("index"))
    def inodes(): Map[String, Long] = {
      val dir = java.nio.file.Paths.get(new java.net.URI(
        hc.path.resolve("it").resolve(Item.DataDir).raw))
      Files.list(dir).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .map(p => p.getFileName.toString ->
          java.nio.file.Files.getAttribute(p, "unix:ino").asInstanceOf[Long]).toMap
    }
    val before = inodes()
    assert(before.nonEmpty)
    val beforeSum = hc.item("it").data.agg(sum("value2")).head.getDouble(0)
    val txn = new Transaction(hc)
    txn.append("it", sampleData.withColumn("value2", lit(9.9))) // succeeds, rewrites
    txn.write("bad", sampleData.select($"index".as("x"), $"value1".as("x"))) // dup col → fails
    intercept[TransactionError](txn.commit())
    // the backup was generation PINS, never a directory copy
    assert(!hc.path.listDirs.exists(_.startsWith("__txn_backup_")),
      "no copied backup dir may exist under the manifest-pin protocol")
    // rollback restored the ORIGINAL part-files by rename: same inodes
    assert(inodes() == before,
      "rollback must return the pre-txn files themselves (renames), not copies")
    assert(hc.item("it").data.agg(sum("value2")).head.getDouble(0) == beforeSum)
    assert(!hc.hasItem("bad"))
    // the internal pin manifest is cleaned up and invisible
    assert(Snapshots.listManifests(hc.path).isEmpty)
    assert(hc.listSnapshots().isEmpty)
    hc.path.parent.parent.deleteRecursively()
  }

  test("round-9 verbs ride the Hadoop backend: rename, drop retention, history, expiry") {
    val hc = hadoopCollection("r9verbs")
    val df = sampleData
    hc.write("it", df, indexCols = Seq("index"))
    // the commit log lands through writeBytesAtomic like any sidecar
    hc.append("it", df.withColumn("value1", col("value1") + 1),
      duplicateHandling = DuplicateHandling.KeepLast)
    val ops = History.entriesOf(Meta.read(hc.path.resolve("it"))).map(_.op)
    assert(ops == Seq("write", "append"), ops)
    // rename is one backend rename; data + log ride along
    hc.renameItem("it", "renamed")
    assert(!hc.hasItem("it") && hc.hasItem("renamed"))
    assert(hc.item("renamed").data.count() == df.count())
    assert(History.entriesOf(Meta.read(hc.path.resolve("renamed")))
      .map(_.op) == Seq("write", "append"))
    // pin + delete: the pinned generation survives in the retained area
    hc.createSnapshot(Some("keep"), manifest = Some(true))
    hc.deleteItem("renamed")
    assert(hc.item("renamed", snapshot = Some("keep")).data.count() == df.count())
    // age-based expiry drops the manifest and GCs the retained bytes
    val res = hc.expireSnapshots(java.time.Instant.now().plusSeconds(60))
    assert(res == Seq(("keep", res.head._2, "expired")))
    assert(hc.listSnapshots().isEmpty)
    val retained = hc.path.resolve(GraftStore.SnapshotsDir).resolve(".retained")
    assert(!retained.isDir || retained.listDirs.isEmpty)
    hc.path.parent.parent.deleteRecursively()
  }

  test("sharded bloom index works through the Hadoop backend (manifest + shard dir + prune)") {
    val c = hadoopCollection("bloom_shard")
    val df = (0 until 200)
      .map(i => (i.toLong, s"key_$i")).toDF("index", "key")
    c.write("it", df, indexCols = Seq("index"), npartitions = Some(4))
    c.buildBloomIndex("it", Seq("key"), singleDocMaxBytes = 0L)
    val itemPath = c.path.resolve("it")
    assert(itemPath.resolve(BloomIndex.manifestName("key")).exists)
    assert(!itemPath.resolve(BloomIndex.sidecarName("key")).exists)
    val hit = c.item("it", filters = Seq(Filters.Pred("key", "==", "key_123")))
    assert(hit.data.collect().map(_.getAs[Long]("index")).toSeq == Seq(123L))
    assert(hit.data.inputFiles.length < 4, "sharded bloom did not prune over HadoopFs")
    val miss = c.item("it", filters = Seq(Filters.Pred("key", "==", "zzz")))
    assert(miss.data.count() == 0 && miss.data.inputFiles.isEmpty)
    assert(c.dropBloomIndex("it") == Seq("key"))
    assert(!itemPath.resolve(BloomIndex.manifestName("key")).exists &&
      !itemPath.resolve(BloomIndex.shardDirName("key")).exists)
    c.path.parent.parent.deleteRecursively()
  }

  test("collection lock is exclusive through the Hadoop backend") {
    val c = hadoopCollection("lock")
    graft.transactions.CollectionLock.acquire(c, "owner-1", timeoutMs = 2000)
    assert(graft.transactions.CollectionLock.currentOwner(c).contains("owner-1"))
    intercept[graft.store.LockTimeoutError] {
      graft.transactions.CollectionLock.acquire(c, "owner-2", timeoutMs = 300)
    }
    graft.transactions.CollectionLock.release(c)
    graft.transactions.CollectionLock.acquire(c, "owner-2", timeoutMs = 2000)
    assert(graft.transactions.CollectionLock.currentOwner(c).contains("owner-2"))
    graft.transactions.CollectionLock.release(c)
    c.path.parent.parent.deleteRecursively()
  }
}
