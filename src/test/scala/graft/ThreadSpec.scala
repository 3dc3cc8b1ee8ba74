package graft

import graft.pipeline.EventOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reply-tree reconstruction (pointer doubling) + dialogue linearization. */
class ThreadSpec extends SparkSpec {

  import spark.implicits._

  /** (post_id, parent_id, author, text) rows → posts frame. */
  private def posts(rows: (Long, Option[Long], Long, String)*): DataFrame =
    rows.toSeq.toDF("post_id", "parent_id", "author", "text")

  test("threadAssembly: hand-built forest — roots, depths, sizes") {
    // thread A: 1 ← 2 ← 3 (chain), 1 ← 4 (branch); thread B: 10 alone
    val df = posts(
      (1L, None, 100L, "a"), (2L, Some(1L), 101L, "b"),
      (3L, Some(2L), 100L, "c"), (4L, Some(1L), 102L, "d"),
      (10L, None, 103L, "e"))
    val got = EventOps.threadAssembly(df)
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        r.getLong(2), r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, None, 1L, 0L, 4L), (2L, Some(1L), 1L, 1L, 4L),
      (3L, Some(2L), 1L, 2L, 4L), (4L, Some(1L), 1L, 1L, 4L),
      (10L, None, 10L, 0L, 1L)))
  }

  test("threadPaths: deep chain settles in O(log depth) rounds with exact chains") {
    // a 200-deep pure chain: 0 ← 1 ← 2 ← … ← 200. maxIter = 10 suffices
    // (doubling: ceil(log2(200)) + 1 = 9) where a per-level walk needs 200.
    val n = 200
    val df = (0 to n).map(i =>
      (i.toLong, if (i == 0) None else Some(i - 1L), i % 3L, s"m$i"))
      .toDF("post_id", "parent_id", "author", "text")
    val paths = EventOps.threadPaths(df, maxIter = 10)
    val deep = paths.filter(col("post_id") === n).head
    assert(deep.getLong(deep.fieldIndex("depth")) == n)
    assert(deep.getLong(deep.fieldIndex("root_id")) == 0L)
    // chain is bottom-up: parent first, root last
    val chain = deep.getSeq[Long](deep.fieldIndex("chain"))
    assert(chain == (n - 1 to 0 by -1).map(_.toLong))
  }

  test("threadPaths: cycle in parent ids raises instead of half-assembling") {
    val df = posts((1L, Some(2L), 0L, "a"), (2L, Some(1L), 1L, "b"))
    val e = intercept[Exception] {
      EventOps.threadPaths(df, maxIter = 5).collect()
    }
    assert(e.getMessage.contains("cycle") || e.getMessage.contains("settle"))
  }

  test("threadLabels: chainless doubling equals threadPaths' labels on the fixture forest") {
    val ev = (0L until 600L).map(e => (e, e % 13, s"t${e % 4}"))
      .toDF("event_id", "user_id", "event_type")
    val p = EventOps.postsInject(ev)
    val viaChain = EventOps.threadPaths(p)
      .select("post_id", "parent_id", "root_id", "depth")
    val viaLabels = EventOps.threadLabels(p)
    assert(viaChain.exceptAll(viaLabels).isEmpty)
    assert(viaLabels.exceptAll(viaChain).isEmpty)
  }

  test("dangling parent ids normalize to roots in BOTH walks (oracle agreement)") {
    // post 2 points at a deleted parent (99, absent from the set) — the
    // norm in a real forum dump: it becomes a thread root, and post 3
    // hangs under it
    val df = posts(
      (1L, None, 0L, "a"), (2L, Some(99L), 1L, "b"), (3L, Some(2L), 2L, "c"))
    val lab = EventOps.threadLabels(df)
      .select("post_id", "parent_id", "root_id", "depth")
      .as[(Long, Option[Long], Long, Long)].collect().sortBy(_._1)
    assert(lab.toSeq == Seq(
      (1L, None, 1L, 0L), (2L, None, 2L, 0L), (3L, Some(2L), 2L, 1L)))
    val viaChain = EventOps.threadPaths(df)
      .select("post_id", "parent_id", "root_id", "depth")
      .as[(Long, Option[Long], Long, Long)].collect().sortBy(_._1)
    assert(viaChain.toSeq == lab.toSeq)
  }

  test("threadLabels: cycle raises from the depth bound, not state blowup") {
    val df = posts((1L, Some(2L), 0L, "a"), (2L, Some(3L), 1L, "b"),
      (3L, Some(1L), 2L, "c"))
    val e = intercept[Exception] {
      EventOps.threadLabels(df, maxIter = 30).collect()
    }
    assert(e.getMessage.contains("cycle"))
  }

  test("threadPaths: cycle raises from the chain-length bound before doubling amplifies it") {
    // with maxIter = 30 the old backstop would only fire after chains
    // reached ~2^30 cells; the per-round length bound fires at size > n
    val df = posts((1L, Some(2L), 0L, "a"), (2L, Some(1L), 1L, "b"))
    val e = intercept[Exception] {
      EventOps.threadPaths(df, maxIter = 30).collect()
    }
    assert(e.getMessage.contains("cycle"))
  }

  test("dialogueChains: linearization order, alternation + min-turns gates") {
    // root 1 (author 7) ← 2 (author 8) ← 3 (author 7): strict alternation,
    // 3 turns → kept. Branch 1 ← 4 (author 7): root and reply share an
    // author AND only 2 turns → leaf 4 dropped twice over.
    // 1 ← 2 ← 5 (author 8): authors 7,8,8 — repeat → dropped.
    val df = posts(
      (1L, None, 7L, "hello"), (2L, Some(1L), 8L, "hi"),
      (3L, Some(2L), 7L, "bye"), (4L, Some(1L), 7L, "self"),
      (5L, Some(2L), 8L, "again"))
    val got = EventOps.dialogueChains(df, minTurns = 3).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(r.fieldIndex("leaf_id")) == 3L)
    assert(r.getLong(r.fieldIndex("root_id")) == 1L)
    assert(r.getLong(r.fieldIndex("n_turns")) == 3L)
    assert(r.getLong(r.fieldIndex("n_speakers")) == 2L)
    assert(r.getString(r.fieldIndex("dialogue")) == "7: hello | 8: hi | 7: bye")
  }

  test("postsInject tree matches a driver-side brute-force walk (sf-free)") {
    // replay the fixture rule in plain Scala over 0..499 and pin the
    // distributed assembly against it — including the mega-thread ids
    import EventOps.{ThreadMegaMod, ThreadMegaResidue, ThreadRootMod, ThreadStepMod}
    val n = 500
    def parent(e: Long): Option[Long] =
      if (e % ThreadMegaMod == ThreadMegaResidue)
        Some(e - ThreadMegaMod).filter(_ >= 0)
      else if (e % ThreadRootMod == 0) None
      else Some(e - 1 - (e % ThreadStepMod)).filter(_ >= 0)
    val depth = scala.collection.mutable.Map.empty[Long, Long]
    val root = scala.collection.mutable.Map.empty[Long, Long]
    (0L until n).foreach { e =>
      parent(e) match {
        case None => depth(e) = 0; root(e) = e
        case Some(p) => depth(e) = depth(p) + 1; root(e) = root(p)
      }
    }
    val ev = (0L until n).map(e => (e, e % 13, s"t${e % 4}"))
      .toDF("event_id", "user_id", "event_type")
    val got = EventOps.threadAssembly(EventOps.postsInject(ev))
      .select("post_id", "root_id", "depth").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(got.length == n)
    got.foreach { case (id, r, d) =>
      assert(r == root(id), s"root of $id")
      assert(d == depth(id), s"depth of $id")
    }
    // the fixture really plants a deep thread: id 497 = 3 + 4*101
    assert(depth(3L + 4L * ThreadMegaMod) >= 4L)
  }
}
