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
}
