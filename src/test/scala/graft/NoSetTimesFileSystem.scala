package graft

import java.net.URI
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Local filesystem whose `setTimes` is the Hadoop BASE class's silent
  * no-op — the connector shape (several object-store FileSystems never
  * override it) that motivates [[graft.operators.CorpusLake]]'s lease
  * re-entry fallback: a restamp that does not observably advance the
  * mtime must fall back to delete + atomic create, or re-entry returns
  * with the crashed incarnation's spent TTL. Registered in specs via
  * `fs.nostamp.impl`; instantiated reflectively by Hadoop. */
class NoSetTimesFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("nostamp:///")
  override def setTimes(p: Path, mtime: Long, atime: Long): Unit = ()
}
