package graft.queries

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame

/** Shared plumbing for the pid-keyed STREAMING gate fixtures (the gates
  * that drive a real file-source stream once per JVM and then answer
  * from the grown store).
  */
private[queries] object Fixtures {

  /** Build the fixture under `root` exactly once per JVM: when
    * `doneMarker` (a path relative to `root`) is absent, any HALF-BUILT
    * fixture from a failed earlier attempt is deleted first — resuming
    * a fixture's stream from its old checkpoint would assign fresh
    * batch ids to re-landed files and leave stale per-batch route/stats
    * dirs, so a failed attempt must restart clean, not resume.
    */
  def onceClean(root: String, doneMarker: String)(build: => Unit): Unit = {
    if (new java.io.File(s"$root/$doneMarker").exists()) return
    val p = new org.apache.hadoop.fs.Path(root)
    // local-FS fixture scratch; RawLocalFileSystem delete is recursive
    p.getFileSystem(new org.apache.hadoop.conf.Configuration())
      .delete(p, true)
    build
  }

  /** Write the terminal `_fixture_done` marker under `root` — call as
    * the LAST statement of an [[onceClean]] build block (after
    * `q.stop()`), so the marker can only exist once every artifact the
    * gates consume has landed. Markers that point at an artifact the
    * stream writes MID-build (e.g. `idx/postings/b1/_SUCCESS`) deem a
    * fixture complete while later-written route/stats/cells dirs are
    * still missing — a crash in that window poisons same-JVM re-entry.
    */
  def done(root: String): Unit =
    Files.write(Paths.get(root, "_fixture_done"), Array.emptyByteArray)

  /** Stage `df` as one parquet file under `root/stage/<tag>` and move
    * the part file into the stream-watched dir (file sources pick up
    * NEW names per batch; parquet keeps float arrays exact). The
    * listing stream is closed — `Files.list` holds the directory handle
    * open otherwise.
    */
  def land(df: DataFrame, root: String, watch: String, tag: String): Unit = {
    val stage = s"$root/stage/$tag"
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    Files.createDirectories(Paths.get(watch))
    val listing = Files.list(Paths.get(stage))
    try listing
      .filter(f => f.getFileName.toString.endsWith(".parquet"))
      .forEach(f => Files.move(f,
        Paths.get(watch, tag + "_" + f.getFileName)))
    finally listing.close()
  }
}
