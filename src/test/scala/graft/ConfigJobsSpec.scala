package graft

import graft.config.Context
import org.scalatest.funsuite.AnyFunSuite

class ConfigJobsSpec extends AnyFunSuite {

  test("dotted dig resolves nested maps") {
    val tree = Map("a" -> Map("b" -> Map("c" -> 42)))
    assert(Context.dig(tree, "a.b.c").contains(42))
    assert(Context.dig(tree, "a.x").isEmpty)
  }

  test("interpolation resolves ${} references to a fixpoint") {
    val tree = Map(
      "base" -> Map("root" -> "/data", "zone" -> "${base.root}/raw"),
      "paths" -> Map("events" -> "${base.zone}/events.parquet"))
    val out = Context.interpolate(tree)
    assert(Context.dig(out, "paths.events").contains("/data/raw/events.parquet"))
  }

  test("unresolvable references survive verbatim (no crash)") {
    val out = Context.interpolate(Map("a" -> "${does.not.exist}"))
    assert(out("a") == "${does.not.exist}")
  }

  test("yaml round trip through a temp file") {
    val f = java.nio.file.Files.createTempFile("graft", ".yml")
    java.nio.file.Files.writeString(f, "core:\n  seed: 7\n  name: x\nlist:\n  - a\n  - b\n")
    val m = Context.loadYaml(f.toString)
    assert(Context.dig(m, "core.seed").map(_.toString).contains("7"))
    assert(m("list") == List("a", "b"))
  }
}
