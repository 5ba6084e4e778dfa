package graft.streaming

import graft.streaming.SnapshotStream.HookEvent

/** The reference's hook DIRECTORIES with their exact failure
  * semantics (backup.sh:16–18, 128–130):
  *
  *  - pre-backup: `run-parts --exit-on-error` under `set -e` — hooks
  *    run IN ORDER and a failure ABORTS the backup tick. A user
  *    relying on a pre-backup hook as a guard ("don't back up during
  *    maintenance") gets that guarantee here: [[firePre]] throws
  *    [[HookAbort]] on the first failing hook and the caller must not
  *    write the snapshot.
  *  - post-backup: `run-parts --reverse` (backup.sh:129) — hooks run
  *    in REVERSE registration order, best-effort (a post hook failure
  *    never fails a backup that already succeeded).
  *  - error: best-effort notification (backup.sh:8).
  *
  * A hook is `HookEvent => Boolean` (true = succeeded) — the
  * signature [[WebhookPublisher.publish]] already has, so a webhook
  * IS a hook; any other side effect (script, log, metric) plugs in
  * the same way.
  */
final case class Hooks(
    pre: Seq[HookEvent => Boolean] = Nil,
    post: Seq[HookEvent => Boolean] = Nil,
    error: Seq[HookEvent => Boolean] = Nil) {

  /** Run every pre-backup hook in order; abort on the first failure
    * (either `false` or a throw — a crashed hook script and a failed
    * one gate identically under `--exit-on-error`).
    */
  def firePre(detail: String): Unit = pre.foreach { h =>
    val ok =
      try h(HookEvent("pre-backup", detail))
      catch { case t: Throwable => throw new HookAbort(detail, Some(t)) }
    if (!ok) throw new HookAbort(detail, None)
  }

  /** Post hooks in reverse order, best-effort. */
  def firePost(detail: String): Unit = post.reverse.foreach { h =>
    try { h(HookEvent("post-backup", detail)); () }
    catch { case _: Throwable => () }
  }

  /** Error hooks in order, best-effort. */
  def fireError(detail: String): Unit = error.foreach { h =>
    try { h(HookEvent("error", detail)); () }
    catch { case _: Throwable => () }
  }
}

object Hooks {
  /** No hooks configured — every fire point is a no-op. */
  val none: Hooks = Hooks()
}

/** A failing pre-backup hook gates the tick (backup.sh:17). */
final class HookAbort(detail: String, cause: Option[Throwable])
  extends RuntimeException(
    s"pre-backup hook failed — backup tick aborted ($detail)", cause.orNull)
