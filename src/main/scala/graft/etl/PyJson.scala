package graft.etl

/** Serializes an [[IssueRecord]] exactly as CPython's
  * `json.dumps(record)` with default arguments would (`transformer.py:395`):
  * `", "` / `": "` separators, `ensure_ascii=True` (non-ASCII escaped as
  * `\uXXXX`, astral chars as surrogate pairs), dict-insertion field order,
  * explicit `null`s. This makes the JSONL sink byte-comparable with the
  * reference's golden corpus.
  */
object PyJson {

  private def esc(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case _ =>
          if (c < 0x20 || c > 0x7e) sb.append(f"\\u${c.toInt}%04x")
          else sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  private def str(sb: java.lang.StringBuilder, v: Option[String]): Unit =
    v match {
      case Some(s) if s != null => esc(sb, s)
      case _                    => sb.append("null")
    }

  private def strArr(sb: java.lang.StringBuilder, vs: Seq[String]): Unit = {
    sb.append('[')
    var first = true
    vs.foreach { v =>
      if (!first) sb.append(", ")
      str(sb, Option(v))
      first = false
    }
    sb.append(']')
  }

  /** One JSONL line (no trailing newline). */
  def serialize(r: IssueRecord): String = {
    // `transform_issue({})` -> `{}`, written verbatim
    // (`transformer.py:238-240, 395`).
    if (r.empty) return "{}"
    val sb = new java.lang.StringBuilder(256)
    sb.append("{\"id\": "); str(sb, Option(r.id))
    r.error match {
      case Some(err) =>
        // Reduced error shape, `transformer.py:306-314` (no qa_pairs key).
        sb.append(", \"error\": "); esc(sb, err)
        sb.append(", \"title\": "); str(sb, Option(r.title))
        sb.append(", \"derived_tasks\": {\"summary\": ")
        esc(sb, r.derived_tasks.summary)
        sb.append(", \"classifications\": ")
        strArr(sb, r.derived_tasks.classifications)
        sb.append("}}")
      case None =>
        sb.append(", \"title\": "); str(sb, Option(r.title))
        sb.append(", \"description\": "); str(sb, Option(r.description))
        sb.append(", \"status\": "); str(sb, r.status)
        sb.append(", \"priority\": "); str(sb, r.priority)
        sb.append(", \"reporter\": "); str(sb, r.reporter)
        sb.append(", \"assignee\": "); str(sb, r.assignee)
        sb.append(", \"created\": "); str(sb, r.created)
        sb.append(", \"updated\": "); str(sb, r.updated)
        sb.append(", \"labels\": "); strArr(sb, r.labels)
        sb.append(", \"components\": "); strArr(sb, r.components)
        sb.append(", \"comments\": [")
        var first = true
        r.comments.foreach { c =>
          if (!first) sb.append(", ")
          first = false
          sb.append("{\"author\": "); str(sb, c.author)
          sb.append(", \"body\": "); str(sb, Option(c.body))
          sb.append(", \"created\": "); str(sb, c.created)
          sb.append('}')
        }
        sb.append("], \"derived_tasks\": {\"summary\": ")
        esc(sb, r.derived_tasks.summary)
        sb.append(", \"classifications\": ")
        strArr(sb, r.derived_tasks.classifications)
        sb.append(", \"qa_pairs\": [")
        first = true
        r.derived_tasks.qa_pairs.foreach { q =>
          if (!first) sb.append(", ")
          first = false
          sb.append("{\"question\": "); esc(sb, q.question)
          sb.append(", \"answer\": "); esc(sb, q.answer)
          sb.append('}')
        }
        sb.append("]}}")
    }
    sb.toString
  }
}
