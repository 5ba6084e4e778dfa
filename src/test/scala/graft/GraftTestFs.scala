package graft

import java.net.URI
import org.apache.hadoop.fs.RawLocalFileSystem

/** A Hadoop [[org.apache.hadoop.fs.FileSystem]] registered under a
  * scheme that is NOT `file:` — local-disk storage behind a foreign
  * URI. Every snapshot/commit op driven through `graftfs://` paths
  * proves the op resolves its FileSystem from the path's scheme and
  * never shortcuts through `java.io.File` / default-FS assumptions —
  * the portability contract an `s3a://`-style destination relies on
  * ([[PortableFsSpec]]). Registered via `fs.graftfs.impl` on the
  * session's Hadoop conf.
  */
class GraftTestFs extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")
}
