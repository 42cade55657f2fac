package graft

import org.scalatest.BeforeAndAfterAll

import graft.sources.{CommitStore, MemoryCommitStore}

/** Runs ENTIRE existing batteries against [[MemoryCommitStore]] — the
  * object-store-semantics store where protocol objects never touch
  * disk. Every `GraftTable(spark, root)` constructed while these suites
  * run (including the handles the SQL path / data source / catalog
  * build internally) resolves the shared in-memory store through
  * [[CommitStore.forRoot]]; any hidden `java.nio` dependency on a
  * commit-deciding path fails loudly here, because the object it would
  * read simply does not exist on the filesystem.
  *
  * Scope: the core table battery (commit/merge/conflict/clone/vacuum/
  * constraints) and COPY INTO (CAS registry + import links). Data-plane
  * bytes (parquet files, bloom sidecars, change-feed dirs) stay on the
  * real filesystem by design — the seam covers the `_graft/` commit
  * protocol only, including the identity allocator's claim files and
  * their rename-time relocation (a seam copy chain, not a directory
  * move).
  */
trait MemoryStoreFixture extends BeforeAndAfterAll { this: org.scalatest.Suite =>
  private var saved: String => CommitStore = _

  override protected def beforeAll(): Unit = {
    super.beforeAll()
    saved = CommitStore.provider
    val mem = new MemoryCommitStore()
    CommitStore.provider = _ => mem
  }

  override protected def afterAll(): Unit = {
    CommitStore.provider = saved
    super.afterAll()
  }
}

/** The whole [[GraftTableSpec]] battery on object-store semantics. */
class MemoryStoreTableSpec extends GraftTableSpec with MemoryStoreFixture

/** COPY INTO (loaded-files CAS registry, import links) on object-store
  * semantics.
  */
class MemoryStoreCopyIntoSpec extends CopyIntoSpec with MemoryStoreFixture

/** The whole row-tracking battery on object-store semantics: id/commit-
  * version allocation, the enablement backfill and the changed-since
  * prune are all manifest-carried state, so they must ride the seam —
  * any raw-filesystem dependency in the new commit fields fails here.
  */
class MemoryStoreRowTrackingSpec extends RowTrackingSpec with MemoryStoreFixture

/** Clause-level merge (update/delete/insert conditions, schema
  * evolution, residual ON) on object-store semantics — the merge commit
  * path reads stats, blooms and the manifest chain around its rewrite.
  */
class MemoryStoreMergeClausesSpec extends MergeClausesSpec with MemoryStoreFixture

/** SQL DML (UPDATE/DELETE/MERGE/INSERT statements, subquery conditions)
  * on object-store semantics — the statement path builds its own table
  * handles, which must resolve the seam store, not the local default.
  */
class MemoryStoreSqlDmlSpec extends SqlDmlSpec with MemoryStoreFixture

/** replaceWhere (partition-predicate overwrite) on object-store
  * semantics.
  */
class MemoryStoreReplaceWhereSpec extends ReplaceWhereSpec with MemoryStoreFixture

/** Identity columns (CAS allocation, rename relocation via the seam's
  * copy chain) on object-store semantics — the rename-time allocator
  * move has no directory rename to lean on here, so any regression to a
  * raw filesystem move loses the floor and fails these suites.
  */
class MemoryStoreIdentityColsSpec extends IdentityColsSpec with MemoryStoreFixture

/** Maintenance (OPTIMIZE/VACUUM/REORG/purge) on object-store semantics —
  * vacuum's live-set derivation walks the manifest chain through the
  * seam; only the data-file deletes themselves stay `java.nio` (data
  * plane, out of seam scope by design).
  */
class MemoryStoreMaintenanceSpec extends MaintenanceSpec with MemoryStoreFixture

/** The identity-keyed streaming hop on object-store semantics — the
  * mirror's txn-marker replay guard, the silver's manifests and both
  * tables' commits all ride the seam (change-feed parquet stays on the
  * data plane).
  */
class MemoryStoreGoldMirrorSpec extends GoldMirrorSpec with MemoryStoreFixture

/** The native streaming source on object-store semantics — offset
  * resolution, the durable init-cursor, admission control and the
  * retention-horizon error all walk the manifest chain through the
  * seam; a hidden `java.nio` manifest read in the offset-log paths
  * fails loudly here.
  */
class MemoryStoreStreamingSourceSpec extends StreamingSourceSpec with MemoryStoreFixture

/** The stored change feed on object-store semantics — feed-version
  * discovery, segment sidecars, repair's manifest walks and the
  * merge-insert id fill (fresh-file lists come from seam-read
  * manifests) must never read commit state off the local filesystem.
  */
class MemoryStoreChangeFeedSpec extends ChangeFeedSpec with MemoryStoreFixture

/** The streaming silver loader on object-store semantics — the loader's
  * txn-marker/checkpoint interplay (effectively-once across foreachBatch
  * replays) commits through table handles that must resolve the seam
  * store; a raw-filesystem marker read would pass locally and break on
  * an object store.
  */
class MemoryStoreStreamingLoaderSpec extends StreamingLoaderSpec with MemoryStoreFixture

/** Streaming dedup ingest on object-store semantics — the gate's
  * stored-sketch reads and its commit-or-skip decisions walk the
  * manifest chain through the seam.
  */
class MemoryStoreStreamingDedupIngestSpec
  extends StreamingDedupIngestSpec with MemoryStoreFixture

/** Streaming backlog admission (bounded catch-up batches) on
  * object-store semantics — offset math over a long commit backlog
  * reads every manifest via the seam.
  */
class MemoryStoreStreamingBacklogSpec
  extends StreamingBacklogSpec with MemoryStoreFixture
