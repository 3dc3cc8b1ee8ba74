package graft

import org.apache.spark.sql.DataFrame

/** Caller-scoped ownership for caches created inside lazy query builders.
  *
  * Operators that persist intermediate frames (savgol's dense grid,
  * twoMeansOn's window base, corpus_pipeline's shared shingle index)
  * have no safe unpersist point inside the builder: the returned frame
  * is lazy, so the cache must outlive the builder call and be released
  * only after the CALLER's terminal action. Registering the persist here
  * hands that release to the nearest enclosing [[CacheScope.scoped]]
  * block. With no enclosing scope the behavior is today's: a
  * session-lifetime cache, released by `spark.catalog.clearCache()` —
  * so one-shot drivers keep working unchanged while long-lived sessions
  * (notebooks, the REST facade, the optimize loop) can compose many
  * queries without accumulating pinned storage.
  *
  * Scopes are per-thread (builders and their terminal action run on the
  * caller's thread; Spark's own task threads never see the registry) and
  * nest: an inner scoped block owns only the persists made inside it.
  */
object CacheScope {

  private val stack = new ThreadLocal[List[scala.collection.mutable.ArrayBuffer[DataFrame]]] {
    override def initialValue(): List[scala.collection.mutable.ArrayBuffer[DataFrame]] = Nil
  }

  private val cpStack = new ThreadLocal[List[scala.collection.mutable.ArrayBuffer[DataFrame]]] {
    override def initialValue(): List[scala.collection.mutable.ArrayBuffer[DataFrame]] = Nil
  }

  /** Persist `df` and register it with the innermost active scope (if
    * any) for release when that scope ends. */
  def persist(df: DataFrame): DataFrame = {
    df.persist()
    stack.get() match {
      case head :: _ => head += df
      case Nil => ()
    }
    df
  }

  /** Eagerly `localCheckpoint` `df` and register the checkpointed frame
    * so the enclosing scope frees its blocks at scope end. Checkpoint
    * blocks have NO lineage — unlike [[persist]]'s caches they are
    * never recomputable and are otherwise freed only on driver GC
    * (ContextCleaner), so a long multi-query session accumulates them
    * in block-manager storage. CALLER CONTRACT: the checkpointed frame
    * (and anything derived from it) must not be read after the
    * enclosing scope ends — scope end drops the only copy of the rows.
    * With no enclosing scope the behavior is plain `localCheckpoint`
    * (blocks live until RDD GC). */
  def checkpoint(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint()
    cpStack.get() match {
      case head :: _ => head += cp
      case Nil => ()
    }
    cp
  }

  /** Run `body` in a fresh scope: every frame persisted through
    * [[persist]] inside it is unpersisted (non-blocking) afterwards,
    * and every frame checkpointed through [[checkpoint]] has its
    * backing RDD blocks dropped. */
  def scoped[T](body: => T): T = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val cpBuf = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    stack.set(buf :: stack.get())
    cpStack.set(cpBuf :: cpStack.get())
    try body
    finally {
      stack.set(stack.get().tail)
      cpStack.set(cpStack.get().tail)
      buf.foreach(df => try df.unpersist(false) catch { case _: Throwable => () })
      cpBuf.foreach { df =>
        try org.apache.spark.sql.GraftCheckpointBridge.backingRdd(df)
          .foreach(_.unpersist(false))
        catch { case _: Throwable => () }
      }
    }
  }
}
