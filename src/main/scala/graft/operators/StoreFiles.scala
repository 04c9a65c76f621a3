package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/** Shared plumbing for on-disk model/index stores (the persistent
  * cluster stores in [[Dedup]]; `Similarity`'s IvfPqStore predates
  * this helper and documents the same conventions inline):
  *
  *  - `manifest.json` is the store's existence marker and is written
  *    temp + ATOMIC_MOVE LAST, so a crash mid-build can never leave a
  *    half-store that `exists()` accepts;
  *  - scratch stores are named per (process, corpus) so concurrent
  *    suites/processes cannot collide and a restarted process
  *    rebuilds rather than trusting another's leftovers;
  *  - the ensure path is locked per store dir: the exists/build
  *    check-then-act must not interleave with a concurrent load of a
  *    half-written store.
  */
private[graft] object StoreFiles {

  def exists(dir: String): Boolean =
    Files.exists(Paths.get(dir, "manifest.json"))

  def writeManifest(dir: String, json: String): Unit = {
    val tmp = Paths.get(dir, "manifest.json.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(dir, "manifest.json"),
      StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def scratchDir(prefix: String, dir: String): String =
    new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      prefix + java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes(StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString.take(12) +
        "_p" + ProcessHandle.current().pid()).toString

  def ensure(locks: java.util.concurrent.ConcurrentHashMap[String, Object],
             store: String)(build: => Unit): String = {
    locks.computeIfAbsent(store, _ => new Object).synchronized {
      if (!exists(store)) build
    }
    store
  }

  // ---- generation-root pointer (_CURRENT.json) -----------------------------
  // The serving face over a ROOT directory of immutable generation
  // subdirs (what `fold` chains produce): readers resolve the served
  // generation through one pointer file, flipped atomically — the
  // `_SHARDS.json` discipline from ShardCompact extended to the model
  // stores. `prev` records the generation the LAST flip displaced; it
  // gets one gc cycle of grace so a reader that planned against the
  // old pointer can finish scanning it (the lakehouse VACUUM retention
  // floor, same as the shard compactor's replaced-generation grace).

  val CurrentName = "_CURRENT.json"

  /** A dir is a committed store iff its marker landed (marker written
    * ATOMIC_MOVE last, so existence = complete): manifest.json for the
    * cluster/embed/phash kinds, model.json for ivfpq.
    */
  def committed(dir: java.nio.file.Path): Boolean =
    Seq("manifest.json", "model.json").exists(m => Files.exists(dir.resolve(m)))

  // Generation names are validated printable (see flip), so the
  // writer needs only the two mandatory JSON escapes and the reader
  // only their inverses — no \uXXXX round-trip to get subtly wrong.
  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c    => c.toString
    } + "\""

  /** (gen, prev) from the root's pointer, if one has landed. Bare
    * subdir names, never paths — the pointer is location-independent
    * so a root can be moved/synced wholesale.
    */
  def readCurrent(root: String): Option[(String, Option[String])] = {
    val p = Paths.get(root, CurrentName)
    if (!Files.exists(p)) None
    else
      try {
        val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        def field(k: String): Option[String] =
          (s""""$k":\\s*"((?:[^"\\\\]|\\\\.)*)"""").r.findFirstMatchIn(s)
            .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
        field("gen").map(g => (g, field("prev")))
      } catch {
        // a pointer that vanished between exists and read = no pointer
        // (serve reports it; gc then REFUSES rather than guessing)
        case _: java.io.IOException => None
      }
  }

  /** Point the root's readers at generation `gen` (a bare subdir name
    * holding a committed store). Temp + ATOMIC_MOVE: a crash leaves
    * the old pointer intact, readers see before-or-after, never mid.
    * The displaced generation is recorded as `prev` for gc's grace
    * window.
    */
  def flip(root: String, gen: String): Either[String, String] = {
    if (gen.isEmpty || gen.contains('/') || gen.contains('\\') ||
        gen == "." || gen == ".." || gen.exists(_ < ' '))
      return Left(s"generation must be a bare printable subdir name, " +
        s"got: '$gen'")
    val genDir = Paths.get(root, gen)
    if (!committed(genDir))
      return Left(s"$genDir holds no committed store (no marker) — " +
        "refusing to point readers at it")
    readCurrent(root) match {
      case Some((g, _)) if g == gen =>
        // idempotent re-flip: do NOT rewrite the pointer — recomputing
        // prev here would drop the displaced generation's grace window
        // and let the next gc collect it under an in-flight reader
        Right(genDir.toString)
      case cur =>
        val prev = cur.map(_._1)
        val json = s"""{"gen": ${jsonStr(gen)}, "prev": ${
          prev.map(jsonStr).getOrElse("null")}}"""
        try {
          // unique temp per flip (not a fixed ".tmp" name): two
          // concurrent flips racing through one temp file could
          // publish flip B's payload under flip A's ATOMIC_MOVE, so A
          // returns Right claiming to serve its own generation while
          // the pointer names B's. Per-flip temp files serialize the
          // race to plain last-writer-wins with accurate returns.
          val tmp = Files.createTempFile(Paths.get(root),
            CurrentName + ".", ".tmp")
          Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
          Files.move(tmp, Paths.get(root, CurrentName),
            StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
          Right(genDir.toString)
        } catch {
          case e: java.io.IOException =>
            Left(s"cannot write $CurrentName at $root: $e")
        }
    }
  }

  /** Resolve the served generation's path through the pointer,
    * re-checking the marker (a gen deleted out from under the pointer
    * must fail loudly at plan time, not as a mid-scan read error).
    */
  def serve(root: String): Either[String, String] =
    readCurrent(root) match {
      case None => Left(s"no $CurrentName pointer at $root")
      case Some((gen, _)) =>
        val genDir = Paths.get(root, gen)
        if (committed(genDir)) Right(genDir.toString)
        else Left(s"pointer names $gen but $genDir holds no " +
          "committed store — flip to a live generation")
    }

  /** Next free `gen-<n>` name under the root: max over ALL existing
    * gen-numbered subdirs + 1, committed or not — a crashed fold's
    * uncommitted litter keeps its name reserved, so a re-run can never
    * write into a dir another attempt may still be writing (the
    * single-folder discipline the shard compactor documents; litter
    * removal is an operator decision, never a guess).
    */
  def nextGenName(root: String): String = {
    val GenPat = "gen-(\\d+)".r
    val used = Option(new java.io.File(root).listFiles()).toSeq.flatten
      .filter(_.isDirectory)
      .flatMap(f => f.getName match {
        case GenPat(n) => Some(n.toLong)
        case _         => None
      })
    s"gen-${if (used.isEmpty) 0L else used.max + 1L}"
  }

  /** Delete committed generations under `root` other than the pointed
    * one, its grace-window `prev`, and any gen-numbered generation
    * NEWER than the pointed one. Uncommitted subdirs are LEFT ALONE —
    * an in-flight fold's output is uncommitted by construction
    * (marker lands last) and deleting it would corrupt a concurrent
    * writer, the exact race the marker protocol exists to close.
    * Newer committed generations are kept for the advance-crash
    * window: an `advance` that crashed between its fold's marker and
    * the flip leaves a committed `gen-<n>` with n above the pointer —
    * exactly the generation the docs tell an operator to flip to by
    * hand — and a cron'd gc racing that flip must not destroy the
    * fold's output. Returns the deleted subdir names.
    */
  def gc(root: String): Either[String, Seq[String]] =
    readCurrent(root) match {
      case None => Left(s"no $CurrentName pointer at $root — refusing " +
        "to gc an unpointed root (nothing marks a generation as live)")
      case Some((gen, prev)) =>
        val keep = Set(gen) ++ prev
        val GenPat = "gen-(\\d+)".r
        val pointedNum = gen match {
          case GenPat(n) => Some(n.toLong)
          case _         => None
        }
        def newerThanPointed(name: String): Boolean =
          (pointedNum, name) match {
            case (Some(p), GenPat(n)) => n.toLong > p
            case _                    => false
          }
        val victims = Option(new java.io.File(root).listFiles()).toSeq
          .flatten
          .filter(f => f.isDirectory && !keep(f.getName) &&
            !newerThanPointed(f.getName) && committed(f.toPath))
        def rec(f: java.io.File): Unit = {
          if (f.isDirectory)
            Option(f.listFiles()).toSeq.flatten.foreach(rec)
          f.delete()
        }
        // The COMMIT MARKER is removed FIRST, and a victim's data is
        // only touched once that delete is confirmed: if collection
        // crashes (or a file is undeletable) partway, the remainder is
        // marker-less litter that committed() rejects — never a
        // half-gutted dir a later flip would happily serve (the
        // marker-last build protocol, inverted for teardown).
        val gone = victims.flatMap { f =>
          val markerGone = Seq("manifest.json", "model.json")
            .map(m => f.toPath.resolve(m).toFile)
            .forall(m => !m.exists() || m.delete())
          if (markerGone) { rec(f); Some(f.getName) } else None
        }
        Right(gone.sorted)
    }
}
