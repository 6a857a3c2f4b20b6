package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}

/** Atomic-by-observation MULTI-STORE appends for the persisted index
  * families (BM25 postings+dl, image bands+hashes, LSH buckets+vectors,
  * PQ codes+vectors).
  *
  * The write-order contract (derived store first, replay-guard store
  * last — see the appendLshDelta comment for the cached-plan recache
  * trap that forces it) guarantees a crashed append CONVERGES on
  * re-run, but until round 12 convergence relied on the re-run
  * re-appending the derived rows and serve-side `distinct()`s absorbing
  * the duplicates. The marker makes the append atomic to any observer
  * instead:
  *
  *   1. [[begin]] records each store's file listing in
  *      `_append_pending` (written via tmp+rename so the marker itself
  *      is never half-written);
  *   2. the caller appends its stores in the usual order;
  *   3. [[commit]] deletes the marker.
  *
  * [[recover]] runs wherever the SafeSwap recoveries run (append /
  * compaction / serve entry): a surviving marker means the append never
  * committed, so every file a store holds beyond its recorded listing —
  * the partial append's rows, whatever subset of stores they reached —
  * is deleted and directories emptied by that are pruned. After
  * recovery the artifact is byte-equivalent to the pre-append state:
  * the replay guard re-admits the whole delta, no duplicate rows ever
  * exist, and serve-side distincts are back to enforcing semantics
  * (multi-table candidate dedup) rather than absorbing crash residue.
  *
  * Single-writer ownership, like every artifact mutation in this
  * library: markers serialize appends against the owner's own crashes,
  * not against concurrent writers.
  */
private[graft] object AppendCommit {

  private def markerOf(indexDir: String) = new Path(indexDir, "_append_pending")
  private def tmpOf(indexDir: String) = new Path(indexDir, "_append_pending.tmp")

  private def listRec(fs: FileSystem, root: Path): Seq[String] = {
    if (!fs.exists(root)) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(p: Path, rel: String): Unit =
      fs.listStatus(p).foreach { s =>
        val r = if (rel.isEmpty) s.getPath.getName else rel + "/" + s.getPath.getName
        if (s.isDirectory) walk(s.getPath, r) else out += r
      }
    walk(root, "")
    out.toSeq
  }

  /** Record the pre-append listing of every store the append will
    * touch. Stores are named relative to `indexDir`; a store that does
    * not exist yet is recorded empty (a crash then removes it
    * entirely). Call AFTER the entry-point recovery, never before. */
  def begin(fs: FileSystem, indexDir: String, stores: Seq[String]): Unit = {
    val sb = new StringBuilder
    stores.foreach { s =>
      sb.append("#store\t").append(s).append('\n')
      listRec(fs, new Path(indexDir, s)).foreach { f =>
        sb.append(s).append('\t').append(f).append('\n')
      }
    }
    val tmp = tmpOf(indexDir)
    val o = fs.create(tmp, true)
    try o.write(sb.toString.getBytes("UTF-8")) finally o.close()
    fs.delete(markerOf(indexDir), false) // stale markers were recovered upstream
    // a silently failed rename would run the whole append UNPROTECTED
    // (no marker → a crash leaves partial rows the old duplicate-row
    // way); the caller must not start writing stores without a durable
    // marker, so a refused rename is an error, not a degraded mode
    require(fs.rename(tmp, markerOf(indexDir)),
      s"could not install append marker under $indexDir; aborting before any store write")
  }

  /** The append's commit point: all stores written. */
  def commit(fs: FileSystem, indexDir: String): Unit =
    fs.delete(markerOf(indexDir), false)

  /** Roll back an uncommitted append, if any. Idempotent; two
    * fs.exists when no crash happened. Returns whether a rollback ran —
    * a caller holding RESIDENT relations over the stores (the PQ warm
    * cache) must drop them on true: their captured file listings can
    * include the partial append's now-deleted files. */
  def recover(fs: FileSystem, indexDir: String): Boolean = {
    fs.delete(tmpOf(indexDir), false) // a crash inside begin()
    val marker = markerOf(indexDir)
    if (!fs.exists(marker)) return false
    val in = fs.open(marker)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    val stores = scala.collection.mutable.LinkedHashMap.empty[String, Set[String]]
    lines.foreach { l =>
      if (l.startsWith("#store\t")) stores(l.stripPrefix("#store\t")) = Set.empty
      else l.split('\t') match {
        case Array(s, f) => stores(s) = stores(s) + f
        case _ =>
      }
    }
    stores.foreach { case (store, keep) =>
      val root = new Path(indexDir, store)
      if (fs.exists(root)) {
        listRec(fs, root).foreach { f =>
          if (!keep.contains(f)) fs.delete(new Path(root, f), false)
        }
        pruneEmpty(fs, root)
        // a store born by the crashed append vanishes with it
        if (keep.isEmpty && fs.exists(root) && fs.listStatus(root).isEmpty)
          fs.delete(root, true)
      }
    }
    fs.delete(marker, false)
    true
  }

  /** Drop directories the file rollback emptied (an empty partition dir
    * would later fail parquet schema inference), bottom-up; the root
    * itself survives. */
  private def pruneEmpty(fs: FileSystem, root: Path): Unit = {
    def walk(p: Path): Boolean = { // returns "now empty"
      val kids = fs.listStatus(p)
      var remaining = kids.length
      kids.foreach { s =>
        if (s.isDirectory && walk(s.getPath)) {
          fs.delete(s.getPath, false)
          remaining -= 1
        }
      }
      remaining == 0
    }
    fs.listStatus(root).filter(_.isDirectory).foreach { s =>
      if (walk(s.getPath)) fs.delete(s.getPath, false)
    }
  }
}
