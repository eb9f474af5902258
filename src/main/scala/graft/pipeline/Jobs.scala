package graft.pipeline

import graft.config.Context

/** Processor registry + declarative job planner + sequential fail-safe
  * runner (reference: src/ta_lib/pyspark/processors.py:32-47 decorator
  * registry, job_planner.py:8-47, job_runner.py:51-78 — the reference's
  * "joblib" docstring notwithstanding, execution is sequential there too).
  */
object Jobs {

  type Processor = (Context, Map[String, Any]) => Unit

  private val registry = scala.collection.mutable.LinkedHashMap[(String, String), Processor]()

  /** Register a processor for (job, task) — the @register_processor
    * equivalent. */
  def register(job: String, task: String)(p: Processor): Unit =
    registry.put((job, task), p)

  def processor(job: String, task: String): Processor =
    registry.getOrElse(
      (job, task),
      throw new IllegalArgumentException(
        s"no processor for job '$job' task '$task'; known: ${registry.keys.mkString(", ")}"))

  final case class TaskPlan(name: String, params: Map[String, Any])
  final case class StagePlan(name: String, tasks: List[TaskPlan])
  final case class JobPlan(name: String, stages: List[StagePlan], failFast: Boolean = false)

  /** job_catalog tree → ordered plans (reference: job_planner.py:8-47). */
  def plan(ctx: Context, jobName: String): List[JobPlan] = {
    val jobs = Context
      .dig(ctx.config, "job_catalog.jobs")
      .map(_.asInstanceOf[List[Map[String, Any]]])
      .getOrElse(Nil)
    val selected = if (jobName == "all") jobs else jobs.filter(_.get("name").contains(jobName))
    if (selected.isEmpty)
      throw new IllegalArgumentException(s"no job '$jobName' in job_catalog")
    selected.map { j =>
      val stages = j.getOrElse("stages", Nil).asInstanceOf[List[Map[String, Any]]].map { s =>
        val tasks = s.getOrElse("tasks", Nil).asInstanceOf[List[Map[String, Any]]].map { t =>
          TaskPlan(
            t("name").toString,
            t.getOrElse("params", Map.empty[String, Any]).asInstanceOf[Map[String, Any]])
        }
        StagePlan(s("name").toString, tasks)
      }
      // fail_fast: a job whose tasks pass data through zones should abort
      // on the first failure — continuing would let later tasks silently
      // consume a STALE zone written by a previous run
      JobPlan(
        j("name").toString,
        stages,
        j.get("fail_fast").exists(_.toString.toBoolean))
    }
  }

  /** Sequential execution; a failing task is reported and does not abort
    * the run (reference _safe_runner, job_runner.py:51-61) unless
    * failFast. Returns the failed (job, stage, task) triples.
    *
    * When the log_catalog names a tracking path, every executed task
    * appends a run record (job/stage/task, params, wall time, status) —
    * the reference's mlflow wrapping (tracking.py, task_runner.py:92-128)
    * as an append-only JSONL log. */
  def run(ctx: Context, jobName: String, failFast: Boolean = false): Seq[(String, String, String)] = {
    val failures = scala.collection.mutable.ListBuffer[(String, String, String)]()
    val track = ctx.trackingPath
    plan(ctx, jobName).foreach { job =>
      // a failed task in a fail-fast job skips the REST OF THAT JOB (its
      // later tasks would read stale zone outputs from a previous run) but
      // not other jobs in an `all` run
      var jobAborted = false
      job.stages.foreach { stage =>
        stage.tasks.foreach { task =>
          if (!jobAborted) {
            val t0 = System.nanoTime()
            def record(status: String, err: Option[String]): Unit =
              track.foreach { p =>
                try Tracking.append(p, Tracking.RunRecord(
                  job.name, stage.name, task.name, status,
                  (System.nanoTime() - t0) / 1e9, task.params, err))
                catch {
                  case e: Throwable =>
                    System.err.println(s"[graft] tracking append failed: ${e.getMessage}")
                }
              }
            try {
              processor(job.name, task.name)(ctx, task.params)
              record("ok", None)
              println(f"[graft] ${job.name}/${stage.name}/${task.name} ok (${(System.nanoTime() - t0) / 1e9}%.1fs)")
            } catch {
              case e: Throwable =>
                failures += ((job.name, stage.name, task.name))
                record("failed", Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
                System.err.println(s"[graft] ${job.name}/${stage.name}/${task.name} FAILED: ${e.getMessage}")
                if (failFast) throw e
                if (job.failFast) {
                  jobAborted = true
                  System.err.println(s"[graft] ${job.name}: fail_fast — skipping the job's remaining tasks")
                }
            }
          }
        }
      }
    }
    failures.toSeq
  }
}
