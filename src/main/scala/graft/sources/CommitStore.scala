package graft.sources

import java.nio.file.{Files, Path}

/** The storage contract the graft commit protocol actually needs — and
  * nothing more. Every operation that decides WHO WINS a commit (or
  * what the latest committed state IS) funnels through this seam, so
  * the 100 TB object-store mapping is an interface with a spec, not a
  * comment:
  *
  *  - [[putIfAbsent]] — the ONLY atomic primitive the protocol
  *    requires. Local FS: hard-link creation (atomic, EEXIST on a lost
  *    race; POSIX rename silently REPLACES and cannot detect one).
  *    S3 / GCS / ABFS: conditional PUT with `If-None-Match: *` (S3
  *    since 2024-08, GCS `ifGenerationMatch=0`, ABFS `If-None-Match`).
  *    Used for: manifest publish (optimistic concurrency), identity
  *    range claims, and the versioned CAS registries (CHECK
  *    constraints, COPY INTO loaded files) — mutable state re-expressed
  *    as immutable version chains so read-modify-write updates retry on
  *    a lost race instead of losing the other writer's entries.
  *    Identity-column RENAME relocates its claim files through this
  *    same primitive as a copy chain + [[delete]] (object stores have
  *    no directory rename; a filesystem move here would be a silent
  *    no-op on every store but the local one).
  *  - [[write]] — publish an immutable, UNIQUELY-NAMED object whose
  *    name nothing references until a later manifest/index commit
  *    lands. Needs write-then-read consistency for the writer, no
  *    atomicity (a torn write is unreferenced garbage vacuum sweeps).
  *    Local: temp file + same-directory ATOMIC_MOVE (readers never see
  *    a partial file); object stores: plain PUT (PUTs are already
  *    all-or-nothing). Used for: manifest chunk files.
  *  - [[replace]] — last-writer-wins upsert of a SINGLE-WRITER or
  *    advisory object (props/refs/txn index: single logical writer per
  *    key; concurrent readers must never see a torn value). Local:
  *    temp file + ATOMIC_MOVE with REPLACE_EXISTING; object stores:
  *    plain PUT.
  *  - [[read]] / [[list]] / [[exists]] — must observe every object a
  *    completed [[putIfAbsent]]/[[write]]/[[replace]] published
  *    (read-after-write consistency — S3/GCS/ABFS all provide it
  *    since 2020; a store that does NOT must front the listing with a
  *    consistent index, the S3Guard/Delta-LogStore shape). `read` of a
  *    missing path throws [[java.nio.file.NoSuchFileException]] — the
  *    sentinel the crash-window scans catch.
  *
  * Data files are OUT of scope by design: Spark's own
  * DataSource/committers handle parquet I/O against any Hadoop
  * filesystem; this seam covers only the `_graft/` metadata protocol.
  */
trait CommitStore {

  /** Atomically create `target` with `content` iff absent. Returns
    * true when this call created it, false when the target already
    * existed (a lost commit race — NEVER replaces). Any other failure
    * throws.
    */
  def putIfAbsent(target: Path, content: String): Boolean

  /** Publish an immutable uniquely-named object (no atomicity
    * contract beyond never-torn reads).
    */
  def write(target: Path, content: String): Unit

  /** Last-writer-wins full replace (never-torn for readers). */
  def replace(target: Path, content: String): Unit

  /** Read a whole object; [[java.nio.file.NoSuchFileException]] when
    * absent.
    */
  def read(path: Path): String

  /** Immediate child NAMES of `dir`; Nil when the directory does not
    * exist.
    */
  def list(dir: Path): Seq[String]

  def exists(path: Path): Boolean

  /** Ensure `dir` exists (no-op on stores without directories). */
  def mkdirs(dir: Path): Unit

  /** Idempotent unconditional delete (object-store DELETE). NOT
    * commit-deciding — only GC (vacuum dropping superseded manifests /
    * registry versions) uses it; a concurrent reader of a deleted
    * object sees [[java.nio.file.NoSuchFileException]] and resolves the
    * newer state through its retry path.
    */
  def delete(path: Path): Unit
}

object CommitStore {
  /** Process-global default-store resolution: every internal handle
    * (SQL path, data source, catalog — any `GraftTable(spark, root)`
    * without an explicit store) resolves its store here. Production
    * leaves the local mapping; suites swap in [[MemoryCommitStore]] to
    * run entire batteries against object-store semantics, which makes
    * any hidden `java.nio` dependency on a commit-deciding path fail
    * loudly (the object simply is not on disk).
    */
  @volatile private[graft] var provider: String => CommitStore =
    _ => LocalCommitStore

  def forRoot(root: String): CommitStore = provider(root)
}

/** Local-filesystem implementation — the semantics every spec runs
  * against, and the reference behavior a remote store implementation
  * must match (see [[CommitStore]] scaladoc for the object-store
  * mapping of each operation).
  */
object LocalCommitStore extends CommitStore {

  override def putIfAbsent(target: Path, content: String): Boolean = {
    Files.createDirectories(target.getParent)
    val tmp = Files.createTempFile(target.getParent, ".cas", ".tmp")
    try {
      Files.writeString(tmp, content)
      // hard-link creation is atomic AND fails with EEXIST when the
      // target exists — the put-if-absent a commit needs. (ATOMIC_MOVE
      // without REPLACE_EXISTING does NOT throw on POSIX: rename(2)
      // silently replaces, letting two claimants both "win".)
      try { Files.createLink(target, tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } finally Files.deleteIfExists(tmp)
  }

  override def write(target: Path, content: String): Unit = {
    Files.createDirectories(target.getParent)
    val tmp = Files.createTempFile(target.getParent, ".wrt", ".tmp")
    try {
      Files.writeString(tmp, content)
      // hard-link creation (the same atomic primitive putIfAbsent rides)
      // makes the duplicate-target error race-proof: an exists-check +
      // rename is TOCTOU — two racing writers on one name both pass the
      // check and the POSIX rename silently replaces, which is exactly
      // the silent data loss this error exists to prevent.
      try Files.createLink(target, tmp)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new IllegalStateException(
            s"CommitStore.write contract violation: $target already exists " +
              "(write targets must be uniquely named; use putIfAbsent for " +
              "contended names)")
      }
    } finally Files.deleteIfExists(tmp)
  }

  override def replace(target: Path, content: String): Unit = {
    Files.createDirectories(target.getParent)
    val tmp = Files.createTempFile(target.getParent, ".rep", ".tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, target,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  override def read(path: Path): String = Files.readString(path)

  override def list(dir: Path): Seq[String] = {
    if (!Files.isDirectory(dir)) return Nil
    val s = Files.list(dir)
    try {
      val it = s.iterator()
      val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next().getFileName.toString
      b.result()
    } finally s.close()
  }

  override def exists(path: Path): Boolean = Files.exists(path)

  override def mkdirs(dir: Path): Unit = Files.createDirectories(dir)

  override def delete(path: Path): Unit = Files.deleteIfExists(path)
}

/** In-memory [[CommitStore]] with the documented OBJECT-STORE shape: a
  * flat key space (no real directories — `list` is a prefix scan,
  * `mkdirs` a no-op), put-if-absent as a conditional PUT
  * (`ConcurrentHashMap.putIfAbsent` — linearizable, like
  * `If-None-Match: *`), write/replace as plain PUTs. Protocol objects
  * written through it NEVER touch disk, so running a whole suite
  * against it proves the seam is complete: any code path that reads or
  * writes commit-deciding state via raw `java.nio` instead of the seam
  * fails loudly with a missing file / invisible commit.
  *
  * `listingLag` (optional fault injection) hides the most recently
  * created `n` objects of each directory from `list` — the
  * eventually-consistent-listing hazard; `read`/`exists` stay
  * consistent, matching real stores where GETs are read-after-write
  * but listings may lag.
  */
final class MemoryCommitStore(listingLag: Int = 0) extends CommitStore {
  private val objects =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  // creation order per directory, for the listing-lag injection
  private val order =
    java.util.Collections.synchronizedList(new java.util.ArrayList[String]())

  private def key(p: Path): String = p.toAbsolutePath.normalize.toString

  override def putIfAbsent(target: Path, content: String): Boolean = {
    val k = key(target)
    val won = objects.putIfAbsent(k, content) == null
    if (won) order.add(k)
    won
  }

  override def write(target: Path, content: String): Unit = {
    val k = key(target)
    if (objects.put(k, content) == null) order.add(k)
  }

  override def replace(target: Path, content: String): Unit =
    write(target, content)

  override def read(path: Path): String = {
    val v = objects.get(key(path))
    if (v == null) throw new java.nio.file.NoSuchFileException(path.toString)
    v
  }

  override def list(dir: Path): Seq[String] = {
    val prefix = key(dir) + "/"
    val names = order.synchronized {
      import scala.jdk.CollectionConverters._
      order.asScala.filter(k =>
        k.startsWith(prefix) && !k.stripPrefix(prefix).contains("/") &&
          objects.containsKey(k)).toSeq
    }
    names.dropRight(listingLag).map(_.stripPrefix(prefix))
  }

  override def exists(path: Path): Boolean = objects.containsKey(key(path))

  override def mkdirs(dir: Path): Unit = ()

  override def delete(path: Path): Unit = objects.remove(key(path))
}
