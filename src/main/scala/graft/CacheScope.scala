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

  /** Run `body` in a fresh scope: every frame persisted through
    * [[persist]] inside it is unpersisted (non-blocking) afterwards. */
  def scoped[T](body: => T): T = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    stack.set(buf :: stack.get())
    try body
    finally {
      stack.set(stack.get().tail)
      buf.foreach(df => try df.unpersist(false) catch { case _: Throwable => () })
    }
  }
}
