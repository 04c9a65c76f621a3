package graft.sources

import java.nio.file.{Files, Path}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/** Page-level resume state for one project: next `startAt` to fetch and
  * the incremental watermark (`reference: extract.py:53-120`).
  */
case class Checkpoint(startAt: Int, lastUpdated: Option[String])

/** Dual-format checkpoint store, drop-in compatible with the reference's
  * `data/checkpoints/` layout (`extract.py:53-120`):
  *
  *  - `{PROJ}.json` — `{"start_at": int, "last_updated": str|null}`;
  *  - legacy `{PROJ}.txt` — just the int (read as fallback, always
  *    written alongside for backward compatibility);
  *  - `save` with `lastUpdated = None` PRESERVES the previously stored
  *    watermark (`extract.py:108-111`) — the subtle behavior that keeps
  *    incremental state alive across pages that carry no newer issue.
  *
  * This is the reference's at-least-once commit protocol: the checkpoint
  * is written AFTER the page file (`extract.py:353-356`), so a crash
  * between the two refetches one page — same guarantee as a Structured
  * Streaming offset commit at page granularity (SURVEY.md §2.9 St2).
  */
class Checkpoints(dir: Path) {
  private val mapper = new ObjectMapper()

  private def jsonPath(project: String): Path = dir.resolve(s"$project.json")
  private def txtPath(project: String): Path = dir.resolve(s"$project.txt")

  def load(project: String): Checkpoint = {
    val jp = jsonPath(project)
    if (Files.exists(jp)) {
      try {
        val node = mapper.readTree(Files.readString(jp))
        val lu = Option(node.get("last_updated"))
          .filter(!_.isNull).map(_.asText())
        return Checkpoint(
          Option(node.get("start_at")).map(_.asInt(0)).getOrElse(0), lu)
      } catch { case _: Exception => () } // corrupt json -> try legacy
    }
    val tp = txtPath(project)
    if (Files.exists(tp)) {
      try return Checkpoint(Files.readString(tp).trim.toInt, None)
      catch { case _: Exception => () }
    }
    Checkpoint(0, None)
  }

  def save(project: String, startAt: Int,
           lastUpdated: Option[String]): Unit = {
    Files.createDirectories(dir)
    // preserve the stored watermark when this save carries none
    val effective = lastUpdated.orElse(load(project).lastUpdated)
    val node: ObjectNode = mapper.createObjectNode()
    node.put("start_at", startAt)
    effective match {
      case Some(v) => node.put("last_updated", v)
      case None    => node.putNull("last_updated")
    }
    // temp + ATOMIC_MOVE (ShardManifest.write's discipline): an
    // in-place write truncated by a crash would parse-fail on restart,
    // and load's legacy fallback silently DROPS the watermark — the
    // next incremental run re-fetches from the lookback floor and
    // permanently skips everything updated between watermark and floor
    atomicWrite(jsonPath(project),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(node))
    atomicWrite(txtPath(project), startAt.toString)
  }

  private def atomicWrite(path: Path, content: String): Unit = {
    val tmp = Files.createTempFile(dir, path.getFileName.toString + ".",
      ".tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, path,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** `--clean` (`main.py:65-96`): remove one project's or all state. */
  def clean(project: Option[String]): Unit = {
    if (!Files.exists(dir)) return
    val matches: java.util.function.Predicate[Path] = p => project match {
      case Some(pr) => p.getFileName.toString.startsWith(pr + ".")
      case None     => true
    }
    // Files.list holds an open DirectoryStream — close it or a worker
    // looping --clean leaks one fd per call until finalization
    val listing = Files.list(dir)
    try listing.filter(matches).forEach(Files.delete(_))
    finally listing.close()
  }
}
