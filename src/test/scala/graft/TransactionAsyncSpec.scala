package graft

import scala.concurrent.Await
import scala.concurrent.duration._

import graft.asyncapi.AsyncCollection
import graft.store._
import graft.transactions._

/** Transactions / locking / async — mirrors reference
  * tests/test_pr77_features.py:252-315, test_phase4_features.py:26-134. */
class TransactionAsyncSpec extends SparkSpec {

  test("transaction commit applies queued ops in order") {
    val c = tempCollection("txn_commit")
    Transaction.withTransaction(c) { txn =>
      txn.write("a", sampleData.limit(10))
      txn.write("b", sampleData.limit(20))
    }
    assert(c.item("a").data.count() == 10)
    assert(c.item("b").data.count() == 20)
    cleanup(c)
  }

  test("failed transaction rolls back every affected item") {
    val c = tempCollection("txn_rollback")
    c.write("a", sampleData.limit(10))
    val txn = new Transaction(c)
    txn.write("a", sampleData.limit(99), overwrite = true)
    txn.append("missing_item", sampleData.limit(1)) // will fail
    intercept[TransactionError] { txn.commit() }
    assert(c.item("a").data.count() == 10, "a must be restored to pre-txn state")
    cleanup(c)
  }

  test("time-layout rollback restores at PERIOD granularity: untouched months keep their files") {
    import org.apache.spark.sql.functions._
    import scala.jdk.CollectionConverters._
    val c = tempCollection("txn_periods")
    import spark.implicits._
    def frame(startDay: String, days: Int, v: Double) = {
      val start = java.time.LocalDate.parse(startDay)
      (0 until days).map { i =>
        (java.sql.Timestamp.valueOf(start.plusDays(i).atStartOfDay()), v)
      }.toDF("index", "value")
    }
    c.write("m", frame("2024-01-01", 90, 1.0), monthlyLayout = true)
    def periodFiles(): Map[String, Set[Object]] = {
      val dataDir = java.nio.file.Paths.get(c.path.resolve("m").resolve(Item.DataDir).raw)
      java.nio.file.Files.list(dataDir).iterator().asScala
        .filter(_.getFileName.toString.startsWith(Collection.MonthCol + "="))
        .map { p =>
          p.getFileName.toString -> java.nio.file.Files.list(p).iterator().asScala
            .filter(_.toString.endsWith(".parquet"))
            .map(f => java.nio.file.Files.getAttribute(f, "unix:ino")).toSet
        }.toMap
    }
    val before = periodFiles()
    val txn = new Transaction(c)
    // touches march (rewrite) and april (new period), then fails
    txn.append("m", frame("2024-03-15", 30, 2.0))
    txn.append("nope", frame("2024-01-01", 1, 0.0)) // missing item → fails
    intercept[TransactionError](txn.commit())
    val after = periodFiles()
    assert(after.keySet == before.keySet, "april (added by the failed txn) must be gone")
    assert(after("__month=2024-01") == before("__month=2024-01"),
      "untouched january keeps its very files (no copy, no rewrite)")
    assert(after("__month=2024-02") == before("__month=2024-02"))
    assert(after("__month=2024-03") == before("__month=2024-03"),
      "march must be the RENAMED-BACK original files, not a copy")
    assert(c.item("m").data.count() == 90)
    assert(c.item("m").data.filter(col("value") === 2.0).count() == 0)
    cleanup(c)
  }

  test("snapshot during an in-flight transaction never captures a partial cut") {
    import org.apache.spark.sql.functions._
    import scala.concurrent.{ExecutionContext, Future}
    implicit val ec: ExecutionContext = ExecutionContext.global
    val c = tempCollection("txn_snap_atomic")
    c.write("seed", sampleData.limit(5))
    // the second op is slowed so the transaction is reliably mid-flight
    // when the snapshot fires
    val slow = udf((x: Double) => { Thread.sleep(15); x })
    val txnDone = Future {
      Transaction.withTransaction(c) { txn =>
        txn.write("a", sampleData.limit(10))
        txn.write("b", sampleData.withColumn("value1", slow(col("value1"))))
      }
    }
    // wait until the txn has visibly committed its FIRST op
    val deadline = System.currentTimeMillis() + 30000
    while (!c.hasItem("a") && System.currentTimeMillis() < deadline) Thread.sleep(5)
    assert(c.hasItem("a"), "txn never started")
    // capture now: the write side of the coordination lock must wait
    // for the whole transaction, so the cut contains BOTH items (a
    // partial cut would miss 'b')
    val snap = c.createSnapshot(Some("mid_txn"), manifest = Some(true))
    Await.result(txnDone, 60.seconds)
    assert(c.item("a", snapshot = Some(snap)).data.count() == 10)
    assert(c.item("b", snapshot = Some(snap)).data.count() == 100,
      "snapshot captured a MIXED transaction cut (item b missing)")
    cleanup(c)
  }

  test("rollbackTo races cleanly with concurrent appends: commit-lock serialization, no corruption") {
    import org.apache.spark.sql.functions._
    import scala.concurrent.{ExecutionContext, Future}
    implicit val ec: ExecutionContext = ExecutionContext.global
    val c = tempCollection("rb_concurrent")
    c.write("x", sampleData.limit(20))
    val before = c.item("x").data.orderBy("index").collect().toSeq
    c.createSnapshot(Some("sp"), manifest = Some(true))
    // five atomic appends of fresh index ranges racing a mid-stream
    // rollback. graft is single-writer by contract (a racing append may
    // fail when the restore renames the files out from under its plan —
    // that is the documented model, same as deleteItem vs append); what
    // the engine MUST guarantee under the race is atomicity: no append
    // half-lands, the item stays readable, and the savepoint restores
    // byte-exact afterwards.
    val appends = Future {
      (1 to 5).map { i =>
        scala.util.Try(c.append("x", sampleData.limit(5)
          .withColumn("index",
            col("index") + expr(s"INTERVAL ${100 * i} DAYS"))))
      }
    }
    c.rollbackTo("sp") // fires somewhere between/around the appends
    Await.result(appends, 120.seconds)
    // every append either landed whole (+5 rows) or failed whole; the
    // mid-stream rollback erased the ones that landed BEFORE it, so the
    // surviving count is 20 + 5k — any non-multiple is a torn append
    val n = c.item("x").data.count()
    assert(n >= 20 && n <= 45 && (n - 20) % 5 == 0,
      s"torn append state: $n rows")
    val last = c.rollbackTo("sp")
    assert(last("x") == "restored" || last("x") == "unchanged")
    assert(c.item("x").data.orderBy("index").collect().toSeq == before)
    cleanup(c)
  }

  test("rollback before commit applies nothing") {
    val c = tempCollection("txn_abort")
    val txn = new Transaction(c)
    txn.write("x", sampleData.limit(5))
    txn.rollback()
    assert(!c.hasItem("x"))
    cleanup(c)
  }

  test("batch transaction coalesces multi-appends per item") {
    val c = tempCollection("txn_batch")
    import spark.implicits._
    def f(d: Int, v: Double) = Seq(
      (java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00"), v)).toDF("index", "value")
    c.write("item", f(1, 1.0))
    val bt = new BatchTransaction(c)
    bt.append("item", f(2, 2.0))
    bt.append("item", f(3, 3.0))
    bt.commit()
    assert(c.item("item").data.count() == 3)
    cleanup(c)
  }

  test("collection lock: second acquire times out, release frees") {
    val c = tempCollection("lock")
    CollectionLock.acquire(c, "owner1")
    assert(CollectionLock.currentOwner(c).contains("owner1"))
    intercept[LockTimeoutError] {
      CollectionLock.acquire(c, "owner2", timeoutMs = 300, pollMs = 50)
    }
    CollectionLock.release(c)
    CollectionLock.withLock(c, "owner2") {
      assert(CollectionLock.currentOwner(c).contains("owner2"))
    }
    assert(CollectionLock.currentOwner(c).isEmpty)
    cleanup(c)
  }

  test("async write/read/batch round-trips match sync results") {
    val c = tempCollection("async")
    AsyncCollection.withAsync(c) { ac =>
      Await.result(ac.write("a", sampleData.limit(10)), 120.seconds)
      val df = Await.result(ac.read("a"), 120.seconds)
      assert(df.count() == 10)
      Await.result(ac.writeBatch(Seq("b" -> sampleData.limit(5), "c" -> sampleData.limit(6))),
        120.seconds)
      val batch = Await.result(ac.readBatch(Seq("a", "b", "c", "zzz")), 120.seconds)
      assert(batch("a").get.count() == 10)
      assert(batch("b").get.count() == 5)
      assert(batch("zzz").isEmpty)
      val items = Await.result(ac.listItems(), 120.seconds)
      assert(items == Set("a", "b", "c"))
    }
    cleanup(c)
  }

  test("concurrent appenders and snapshotters stay consistent under the commit lock") {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val c = tempCollection("conc_smoke")
    def frame(fromDay: Int, n: Int) = {
      import spark.implicits._
      (fromDay until fromDay + n).map { i =>
        (java.sql.Timestamp.valueOf(
          java.time.LocalDate.parse("2024-01-01").plusDays(i).atStartOfDay()),
          i.toDouble, s"r$i")
      }.toDF("index", "value", "tag")
    }
    c.write("a", frame(0, 5))
    c.write("b", frame(0, 5))
    val pool = Executors.newFixedThreadPool(3)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // separate Collection instances per thread — distinct jobs sharing
    // only the store path; the static per-path commit lock is the
    // coordination point
    val ca = Collection.at(spark, c.path)
    val cb = Collection.at(spark, c.path)
    val cs = Collection.at(spark, c.path)
    val wa = Future { for (k <- 1 to 10) ca.append("a", frame(k * 5, 5)) }
    val wb = Future { for (k <- 1 to 10) cb.append("b", frame(k * 5, 5)) }
    val snaps = Future {
      (1 to 5).map { i =>
        Thread.sleep(150)
        cs.createSnapshot(Some(s"s$i"), manifest = Some(true))
      }
    }
    Await.result(Future.sequence(Seq(wa, wb, snaps.map(_ => ()))), 300.seconds)
    pool.shutdown()
    // no lost updates: every committed batch's rows are present exactly once
    assert(c.item("a").data.count() == 55)
    assert(c.item("b").data.count() == 55)
    // every snapshot pinned a CONSISTENT cut: counts are whole batches,
    // monotone in snapshot order, and stable across re-reads
    val counts = (1 to 5).map { i =>
      val na = c.item("a", snapshot = Some(s"s$i")).data.count()
      val nb = c.item("b", snapshot = Some(s"s$i")).data.count()
      assert(na % 5 == 0 && na >= 5 && na <= 55, s"s$i a=$na")
      assert(nb % 5 == 0 && nb >= 5 && nb <= 55, s"s$i b=$nb")
      assert(c.item("a", snapshot = Some(s"s$i")).data.count() == na)
      (na, nb)
    }
    assert(counts.map(_._1) == counts.map(_._1).sorted)
    assert(counts.map(_._2) == counts.map(_._2).sorted)
    // a rollback to a mid-run cut restores exactly the pinned counts
    val (ra, rb) = counts(2)
    c.rollbackTo("s3")
    assert(c.item("a").data.count() == ra)
    assert(c.item("b").data.count() == rb)
    cleanup(c)
  }

  test("rollback refuses to rewind an item a FOREIGN commit touched mid-transaction") {
    // a txn's own ops are fenced (a foreign commit's rows fold forward
    // through the append), but the rollback is a blind rewind to the
    // pre-txn pin — it would erase the foreign writer's data. The
    // generation chain the txn tracks detects the interleaving and the
    // rollback REFUSES that item, keeping the pin for manual
    // resolution and restoring the untouched items.
    import spark.implicits._
    val c = tempCollection("txn_foreign")
    c.write("a", Seq((1, 1.0)).toDF("index", "value"), indexCols = Seq("index"))
    c.write("b", Seq((1, 1.0)).toDF("index", "value"), indexCols = Seq("index"))
    val other = Collection.at(spark, c.path) // the "foreign writer"
    @volatile var injected = false
    // inject the foreign append the instant the txn publishes item b —
    // after the txn's op on a, before the txn's failing op
    Collection.commitSeamHook = name =>
      if (name == "full_staged:b" && !injected) {
        injected = true
        other.append("a", Seq((50, 5.0)).toDF("index", "value"))
      }
    try {
      val txn = new Transaction(c)
      txn.append("a", Seq((2, 2.0)).toDF("index", "value"))
      txn.append("b", Seq((2, 2.0)).toDF("index", "value"))
      txn.append("missing", Seq((1, 1.0)).toDF("index", "value")) // fails → rollback
      val e = intercept[TransactionError](txn.commit())
      assert(e.getMessage.contains("restore REFUSED for a"), e.getMessage)
      assert(e.getMessage.contains("foreign"), e.getMessage)
    } finally Collection.commitSeamHook = _ => ()
    assert(injected, "the foreign append must have fired")
    // item a keeps the txn's folded rows AND the foreign row — nothing
    // of the other writer's was destroyed; item b was restored
    assert(c.item("a").data.select("index").collect().map(_.getInt(0)).toSet
      == Set(1, 2, 50))
    assert(c.item("b").data.count() == 1, "b must be restored to pre-txn state")
    cleanup(c)
  }

  test("rollback restores an item whose OWN op threw post-publish (not misread as a foreign commit)") {
    // an op that commits and THEN throws (e.g. a stats-refresh
    // read-back failure) moved the generation without the txn's
    // post-op bookkeeping running — before the publish-point observer,
    // that read as a foreign writer: restore REFUSED, the partial
    // commit left live, and the error blamed a writer that never
    // existed. The observer records the generation at the sidecar
    // write itself, so the rewind proceeds and the rollback guarantee
    // holds in the single-writer failure.
    import spark.implicits._
    val c = tempCollection("txn_own_postcommit")
    c.write("a", Seq((1, 1.0)).toDF("index", "value"), indexCols = Seq("index"))
    Collection.commitSeamHook = name =>
      if (name == "full_post_sidecar:a")
        throw new RuntimeException("post-commit stats read-back failed")
    try {
      val txn = new Transaction(c)
      txn.append("a", Seq((2, 2.0)).toDF("index", "value"))
      val e = intercept[TransactionError](txn.commit())
      assert(!e.getMessage.contains("foreign"), e.getMessage)
      assert(!e.getMessage.contains("REFUSED"), e.getMessage)
      assert(!e.getMessage.contains("FAILED"), e.getMessage)
    } finally Collection.commitSeamHook = _ => ()
    // the partial commit was rewound: pre-txn state serves
    assert(c.item("a").data.select("index").collect().map(_.getInt(0)).toSet
      == Set(1), "the own partial commit must be rewound to the pre-txn pin")
    cleanup(c)
  }

  test("two threads appending the SAME item serialize via the generation fence (no lost update)") {
    // before the fence, both threads could read the same base state,
    // stage independently, and the second publish silently clobbered
    // the first's rows (the commit lock is SHARED among commits) — the
    // in-JVM spelling of the cross-process race CrashKillSpec proves
    // with forked JVMs. The fence refuses the stale publish and append
    // retries over the fresh state, so every batch survives.
    import java.util.concurrent.Executors
    import scala.concurrent.{ExecutionContext, Future}
    import spark.implicits._
    val c = tempCollection("conc_same_item")
    c.write("it", (0 until 10).map(i => (i, 0.0)).toDF("index", "value"),
      indexCols = Seq("index"))
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val c1 = Collection.at(spark, c.path)
    val c2 = Collection.at(spark, c.path)
    def batch(tag: Int, k: Int) = (0 until 10)
      .map(i => (1000 + tag * 100 + k * 10 + i, tag.toDouble))
      .toDF("index", "value")
    val f1 = Future { for (k <- 0 until 4) c1.append("it", batch(1, k)) }
    val f2 = Future { for (k <- 0 until 4) c2.append("it", batch(2, k)) }
    Await.result(Future.sequence(Seq(f1, f2)), 300.seconds)
    pool.shutdown()
    assert(c.item("it").data.count() == 10 + 2 * 4 * 10,
      "every thread's every batch must survive — no lost update")
    val idx = c.item("it").data.select("index").collect().map(_.getInt(0)).toSet
    for (tag <- 1 to 2; k <- 0 until 4; i <- 0 until 10)
      assert(idx.contains(1000 + tag * 100 + k * 10 + i), s"writer $tag batch $k lost")
    assert(History.entriesOf(Meta.read(c.path.resolve("it"))).size == 9,
      "one commit-log entry per append — none lost, none phantom")
    cleanup(c)
  }

  test("snapshot-lock verbs refuse typed while this thread holds the commit side (no silent deadlock)") {
    import spark.implicits._
    val c = tempCollection("lock_guard")
    c.write("it", Seq((1, 1.0)).toDF("index", "value"), indexCols = Seq("index"))
    // a read->write upgrade on the coordination lock would hang forever;
    // the guard turns "createSnapshot/vacuum inside a transaction" into
    // a typed error instead
    c.withCommitLock {
      val e = intercept[GraftError](c.createSnapshot(Some("x"), manifest = Some(true)))
      assert(e.getMessage.contains("transaction"), e.getMessage)
      assert(intercept[GraftError](c.vacuum()).getMessage.contains("snapshot lock"))
    }
    // outside the hold both verbs work
    c.createSnapshot(Some("x"), manifest = Some(true))
    c.vacuum()
    cleanup(c)
  }

  test("EXCLUSIVE transaction holds every affected item's cross-process lock for its whole body") {
    import spark.implicits._
    val c = tempCollection("txn_exclusive")
    c.write("a", Seq((1, 1.0)).toDF("index", "value"), indexCols = Seq("index"))
    c.write("b", Seq((1, 1.0)).toDF("index", "value"), indexCols = Seq("index"))
    c.enableMultiprocess()
    def held(): Set[String] =
      c.path.listDirs.filter(_.startsWith(Collection.ItemLockPrefix)).toSet
    var atOps: Set[String] = null
    Collection.commitSeamHook = name =>
      if (name.startsWith("txn_ops_begin:")) atOps = held()
    try Transaction.withTransaction(c, exclusive = true) { txn =>
      txn.append("a", Seq((2, 2.0)).toDF("index", "value"))
      txn.append("b", Seq((2, 2.0)).toDF("index", "value"))
    } finally Collection.commitSeamHook = _ => ()
    assert(atOps == Set("__itemlock_a", "__itemlock_b"),
      s"the exclusive commit must hold both item locks at its ops seam, held: $atOps")
    assert(held().isEmpty, "locks must release at commit end")
    assert(c.item("a").data.count() == 2 && c.item("b").data.count() == 2)
    // a NON-exclusive transaction holds no item lock at the same seam
    // (foreign commits may legally interleave between its ops)
    var atOpsPlain: Set[String] = Set("sentinel")
    Collection.commitSeamHook = name =>
      if (name.startsWith("txn_ops_begin:")) atOpsPlain = held()
    try Transaction.withTransaction(c) { txn =>
      txn.append("a", Seq((3, 3.0)).toDF("index", "value"))
    } finally Collection.commitSeamHook = _ => ()
    assert(atOpsPlain == Set.empty,
      s"a non-exclusive txn must hold no item lock across ops, held: $atOpsPlain")
    // a FAILING exclusive transaction rolls back under the same locks
    // and releases every one of them
    val txn = new Transaction(c, exclusive = true)
    txn.append("a", Seq((4, 4.0)).toDF("index", "value"))
    txn.append("missing_item", Seq((1, 1.0)).toDF("index", "value"))
    intercept[TransactionError](txn.commit())
    assert(held().isEmpty, "a failing exclusive txn must release every lock")
    assert(c.item("a").data.count() == 3, "rollback must restore the pre-txn state")
    cleanup(c)
  }

  test("rollback refuses an item whose op FOLDED a fence-refused foreign commit mid-retry") {
    // The subtle spelling of the foreign-interleave hazard: the
    // foreign commit lands DURING the txn's own op, between its
    // staging read and its publish. The fence refuses the op's first
    // publish; retryOnConflict re-reads (folding the foreign rows
    // forward) and the SECOND publish succeeds — so the publish
    // observer records the op's final generation and the generation
    // chain reads as purely ours: neither the pre-op check nor the
    // rollback's locked re-check can ever see the interleave. Only
    // the per-thread interleave counter (bumped on every fence
    // refusal) carries the trace; without it, rollback restored the
    // pre-txn pin and silently destroyed the foreign writer's
    // durably-acknowledged commit.
    import spark.implicits._
    val c = tempCollection("txn_foreign_midretry")
    c.write("a", Seq((1, 1.0)).toDF("index", "value"), indexCols = Seq("index"))
    c.write("b", Seq((1, 1.0)).toDF("index", "value"), indexCols = Seq("index"))
    val other = Collection.at(spark, c.path) // the "foreign writer"
    @volatile var injected = false
    // inject the foreign append between the txn op's staging and its
    // publish — the op's first publish then fence-refuses and retries
    Collection.commitSeamHook = name =>
      if (name == "staged_pre_publish:a" && !injected) {
        injected = true
        other.append("a", Seq((50, 5.0)).toDF("index", "value"))
      }
    try {
      val txn = new Transaction(c)
      txn.append("a", Seq((2, 2.0)).toDF("index", "value"))
      txn.append("missing", Seq((1, 1.0)).toDF("index", "value")) // fails → rollback
      val e = intercept[TransactionError](txn.commit())
      assert(e.getMessage.contains("restore REFUSED for a"), e.getMessage)
      assert(e.getMessage.contains("foreign"), e.getMessage)
    } finally Collection.commitSeamHook = _ => ()
    assert(injected, "the foreign append must have fired")
    // item a keeps BOTH the op's folded rows and the foreign row —
    // nothing of the other writer's durably-acknowledged commit was
    // destroyed; item b (untouched) stays at its pre-txn state
    assert(c.item("a").data.select("index").collect().map(_.getInt(0)).toSet
      == Set(1, 2, 50))
    assert(c.item("b").data.count() == 1)
    cleanup(c)
  }

  test("a folded foreign commit is refused even when the op throws POST-publish") {
    // the two hazards combined: the op folds a fence-refused foreign
    // commit mid-retry, publishes, and THEN throws in its post-commit
    // read-back — the failing op itself is the rollback trigger, so
    // the interleave sample must run on the exception path (finally),
    // not only on the op's normal return; otherwise this rollback
    // rewinds the foreign writer's rows after all.
    import spark.implicits._
    val c = tempCollection("txn_foreign_postthrow")
    c.write("a", Seq((1, 1.0)).toDF("index", "value"), indexCols = Seq("index"))
    val other = Collection.at(spark, c.path)
    @volatile var injected = false
    @volatile var postSidecars = 0
    Collection.commitSeamHook = {
      case "staged_pre_publish:a" if !injected =>
        injected = true
        other.append("a", Seq((50, 5.0)).toDF("index", "value"))
      case "full_post_sidecar:a" =>
        postSidecars += 1
        // 1st fire = the foreign writer's commit; 2nd = the txn op's
        // own successful (post-fold) publish — fail right after it
        if (postSidecars == 2)
          throw new RuntimeException("post-commit stats read-back failed")
      case _ => ()
    }
    try {
      val txn = new Transaction(c)
      txn.append("a", Seq((2, 2.0)).toDF("index", "value"))
      val e = intercept[TransactionError](txn.commit())
      assert(e.getMessage.contains("restore REFUSED for a"), e.getMessage)
      assert(e.getMessage.contains("foreign"), e.getMessage)
    } finally Collection.commitSeamHook = _ => ()
    assert(injected && postSidecars >= 2, s"arm misfired: $injected/$postSidecars")
    // the foreign row and the folded op rows all survive the rollback
    assert(c.item("a").data.select("index").collect().map(_.getInt(0)).toSet
      == Set(1, 2, 50))
    cleanup(c)
  }

  test("EXCLUSIVE transaction over hundreds of items acquires its lock set iteratively") {
    // the lock-set acquisition is one loop (Collection
    // .withItemProcessLockAll), not a closure nest one frame deep per
    // item — a 10k-item exclusive batch must not overflow the stack
    // mid-acquire. Smoke at hundreds of items with metadata-only ops
    // (deletes of absent items cost fs ops, no Spark job): the lock
    // machinery is what's under test.
    val c = tempCollection("txn_exclusive_wide")
    c.enableMultiprocess()
    val items = (1 to 400).map(i => f"w$i%04d")
    var atOps = -1
    Collection.commitSeamHook = name =>
      if (name.startsWith("txn_ops_begin:"))
        atOps = c.path.listDirs.count(_.startsWith(Collection.ItemLockPrefix))
    val txn = new Transaction(c, exclusive = true)
    items.foreach(txn.delete)
    try txn.commit() finally Collection.commitSeamHook = _ => ()
    assert(atOps == 400, s"all 400 item locks must be held at the ops seam, saw $atOps")
    assert(!c.path.listDirs.exists(_.startsWith(Collection.ItemLockPrefix)),
      "every lock must release at commit end")
    cleanup(c)
  }
}
