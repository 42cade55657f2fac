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
  *    range claims.
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
    val tmp = target.getParent.resolve(s".tmp-${target.getFileName}")
    Files.writeString(tmp, content)
    Files.move(tmp, target, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
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
}
