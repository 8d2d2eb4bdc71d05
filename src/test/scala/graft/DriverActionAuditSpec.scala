package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Enforces docs/driver_action_audit.md: every `.collect()`,
  * `localCheckpoint(` and `.isEmpty` site in src/main must carry a
  * recorded bounded-domain or bounded-round argument, and every recorded
  * entry must still exist in the source (r13 verdict item 7 — the same
  * class-closure treatment BroadcastAuditSpec gives forced broadcasts).
  * A collect of a growing table is the "operator isn't distributed"
  * anti-pattern; this makes the r12 all-collects-bounded audit claim
  * survive future edits: a new driver action on an unaudited line fails
  * here until its boundedness is written down, and dropping one flags
  * the stale audit row for cleanup. Keys are (file, trimmed line,
  * occurrence count) so a copy-pasted second occurrence of an audited
  * line also forces a re-audit.
  */
class DriverActionAuditSpec extends AnyFunSuite {

  private val auditPath = Paths.get("docs/driver_action_audit.md")
  private val srcRoot = Paths.get("src/main/scala")
  private val patterns =
    Seq("""\.collect\(\)""".r, """localCheckpoint\(""".r, """\.isEmpty""".r)

  private def sourceSites(): Map[(String, String), Int] = {
    val out = scala.collection.mutable.Map.empty[(String, String), Int]
    Files.walk(srcRoot).iterator().asScala
      .filter(p => p.toString.endsWith(".scala") && Files.isRegularFile(p))
      .foreach { p =>
        Files.readAllLines(p).asScala.foreach { line =>
          val t = line.trim
          if (patterns.exists(_.findFirstIn(t).isDefined) &&
              !t.startsWith("//") && !t.startsWith("*") && !t.startsWith("/*")) {
            val k = (p.toString, t)
            out(k) = out.getOrElse(k, 0) + 1
          }
        }
      }
    out.toMap
  }

  private val EntryRe = """^- (\d+)x `(.+)` — (.+)$""".r

  private def auditEntries(): (Map[(String, String), Int], Seq[String]) = {
    var file = ""
    val entries = scala.collection.mutable.Map.empty[(String, String), Int]
    val badReasons = scala.collection.mutable.ArrayBuffer.empty[String]
    Files.readAllLines(auditPath).asScala.foreach { line =>
      if (line.startsWith("## ")) file = line.drop(3).trim
      else line match {
        case EntryRe(n, code, reason) =>
          entries((file, code)) = n.toInt
          if (reason.trim.length < 20)
            badReasons += s"$file: `$code` (reason too thin: '$reason')"
        case _ => ()
      }
    }
    (entries.toMap, badReasons.toSeq)
  }

  test("every driver-action site is audited with a bounded-domain/round argument") {
    assert(Files.exists(auditPath), s"missing $auditPath")
    val src = sourceSites()
    val (audit, badReasons) = auditEntries()
    assert(badReasons.isEmpty,
      s"audit entries need a real boundedness argument:\n${badReasons.mkString("\n")}")
    val unaudited = src.filter { case (k, n) => audit.getOrElse(k, -1) != n }
    assert(unaudited.isEmpty,
      "un-audited (or count-changed) driver-action sites — add a bounded-" +
        s"domain/round argument to $auditPath:\n" +
        unaudited.map { case ((f, t), n) => s"$f: ${n}x $t" }.mkString("\n"))
    val stale = audit.filter { case (k, n) => src.getOrElse(k, -1) != n }
    assert(stale.isEmpty,
      s"stale audit entries (site edited or removed) — clean up $auditPath:\n" +
        stale.map { case ((f, t), n) => s"$f: ${n}x $t" }.mkString("\n"))
  }
}
