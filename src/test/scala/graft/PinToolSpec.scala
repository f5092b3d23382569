package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import scala.sys.process._

/** Guards the quiet-pin MONOTONE RULE (round-16 verdict item 6,
  * enforced in round 18): tools/make_quiet_pin.py must never let a
  * pin entry INCREASE across a refresh unless the query is named in
  * `--rebase` (a plan-changed query whose old floor is stale). An
  * increase sneaking through would re-soften the bench's median-rel
  * load detector for exactly the drift-prone tier.
  *
  * Runs the real tool via python3 (present wherever the oracle
  * selfcheck runs); skips cleanly when python3 is unavailable.
  */
class PinToolSpec extends AnyFunSuite {

  private val repoRoot = new java.io.File(".").getCanonicalFile
  private val tool = new java.io.File(repoRoot, "tools/make_quiet_pin.py")

  private def havePython: Boolean =
    scala.util.Try(Seq("python3", "--version").!).toOption.contains(0)

  private def write(dir: Path, name: String, content: String): Path = {
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p
  }

  private def benchLine(times: Map[String, Double]): String = {
    val qs = times.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    s"""{"metric":"total","value":1.0,"unit":"sec","queries":$qs}"""
  }

  private def run(args: Seq[String]): (Int, String, String) = {
    val out = new StringBuilder
    val err = new StringBuilder
    val rc = Process(Seq("python3", tool.getPath) ++ args).!(
      ProcessLogger(l => { out.append(l).append('\n'); () },
        l => { err.append(l).append('\n'); () }))
    (rc, out.toString, err.toString)
  }

  private def parsePin(out: String): Map[String, Double] =
    out.linesIterator.filterNot(_.startsWith("#"))
      .filter(_.nonEmpty)
      .map { l => val Array(q, t) = l.split("\t"); q -> t.toDouble }
      .toMap

  test("default merge is elementwise min — an entry can never increase") {
    assume(havePython, "python3 not available")
    val dir = Files.createTempDirectory("pinspec")
    val cur = write(dir, "cur.tsv", "# pin\nq_fast\t0.1000\nq_slow\t0.5000\n")
    val bench = write(dir, "b.json",
      benchLine(Map("q_fast" -> 0.30, "q_slow" -> 0.40, "q_new" -> 0.20)))
    val (rc, out, _) = run(Seq("--current", cur.toString, bench.toString))
    assert(rc == 0)
    val pin = parsePin(out)
    assert(pin("q_fast") == 0.10) // drifted-host 0.30 must NOT replace 0.10
    assert(pin("q_slow") == 0.40) // a faster observation tightens
    assert(pin("q_new") == 0.20)  // new queries enter at observed value
  }

  test("--no-merge without --rebase REJECTS an increase (exit 2)") {
    assume(havePython, "python3 not available")
    val dir = Files.createTempDirectory("pinspec")
    val cur = write(dir, "cur.tsv", "q_fast\t0.1000\n")
    val bench = write(dir, "b.json", benchLine(Map("q_fast" -> 0.30)))
    val (rc, _, err) = run(Seq("--current", cur.toString, "--no-merge",
      bench.toString))
    assert(rc == 2)
    assert(err.contains("q_fast"))
  }

  test("--rebase lets a PLAN-CHANGED query re-base upward, others stay") {
    assume(havePython, "python3 not available")
    val dir = Files.createTempDirectory("pinspec")
    val cur = write(dir, "cur.tsv", "q_changed\t0.1000\nq_same\t0.2000\n")
    val bench = write(dir, "b.json",
      benchLine(Map("q_changed" -> 0.30, "q_same" -> 0.50)))
    // merge mode: rebase applies to the named query only
    val (rc, out, _) = run(Seq("--current", cur.toString,
      "--rebase", "q_changed", bench.toString))
    assert(rc == 0)
    val pin = parsePin(out)
    assert(pin("q_changed") == 0.30)
    assert(pin("q_same") == 0.20)
    // no-merge mode: the unrebased increase still rejects
    val (rc2, _, err2) = run(Seq("--current", cur.toString, "--no-merge",
      "--rebase", "q_changed", bench.toString))
    assert(rc2 == 2)
    assert(err2.contains("q_same"))
  }

  test("--rebase of an unknown query is an error") {
    assume(havePython, "python3 not available")
    val dir = Files.createTempDirectory("pinspec")
    val cur = write(dir, "cur.tsv", "q\t0.1000\n")
    val bench = write(dir, "b.json", benchLine(Map("q" -> 0.05)))
    val (rc, _, err) = run(Seq("--current", cur.toString,
      "--rebase", "q_typo", bench.toString))
    assert(rc == 2)
    assert(err.contains("q_typo"))
  }
}
