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

  test("job runner appends a tracking record per executed task") {
    val log = java.nio.file.Files.createTempDirectory("graft-track")
      .resolve("run_log.jsonl").toString
    val cfg: Map[String, Any] = Map(
      "job_catalog" -> Map("jobs" -> List(
        Map(
          "name" -> "tjob",
          "stages" -> List(Map(
            "name" -> "tstage",
            "tasks" -> List(
              Map("name" -> "ok-task", "params" -> Map("alpha" -> 1, "mode" -> "fast")),
              Map("name" -> "bad-task"))))))),
      "log_catalog" -> Map("tracking" -> Map("path" -> log)))
    val ctx = Context(cfg, null)
    graft.pipeline.Jobs.register("tjob", "ok-task")((_, _) => ())
    graft.pipeline.Jobs.register("tjob", "bad-task")((_, _) => throw new RuntimeException("boom"))
    val failures = graft.pipeline.Jobs.run(ctx, "tjob")
    assert(failures == Seq(("tjob", "tstage", "bad-task")))
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(log))
    assert(lines.size() == 2)
    assert(lines.get(0).contains("\"status\":\"ok\"") && lines.get(0).contains("\"alpha\":1")
      && lines.get(0).contains("\"mode\":\"fast\""))
    assert(lines.get(1).contains("\"status\":\"failed\"") && lines.get(1).contains("boom"))
  }

  test("fail_fast job skips its remaining tasks after a failure") {
    val ran = scala.collection.mutable.ListBuffer[String]()
    val cfg: Map[String, Any] = Map(
      "job_catalog" -> Map("jobs" -> List(
        Map(
          "name" -> "ffjob",
          "fail_fast" -> true,
          "stages" -> List(Map(
            "name" -> "s",
            "tasks" -> List(
              Map("name" -> "t1"), Map("name" -> "boom"), Map("name" -> "t3"))))))))
    val ctx = Context(cfg, null)
    graft.pipeline.Jobs.register("ffjob", "t1")((_, _) => ran += "t1")
    graft.pipeline.Jobs.register("ffjob", "boom")((_, _) => throw new RuntimeException("x"))
    graft.pipeline.Jobs.register("ffjob", "t3")((_, _) => ran += "t3")
    val failures = graft.pipeline.Jobs.run(ctx, "ffjob")
    assert(failures.map(_._3) == Seq("boom"))
    assert(ran.toSeq == Seq("t1"), s"t3 must not run after a fail_fast failure; ran $ran")
  }

  test("yaml round trip through a temp file") {
    val f = java.nio.file.Files.createTempFile("graft", ".yml")
    java.nio.file.Files.writeString(f, "core:\n  seed: 7\n  name: x\nlist:\n  - a\n  - b\n")
    val m = Context.loadYaml(f.toString)
    assert(Context.dig(m, "core.seed").map(_.toString).contains("7"))
    assert(m("list") == List("a", "b"))
  }
}
