package graft.model

import graft.SparkTestBase
import graft.connector.{MockSalesforceBulkApi, MockSfmcApi}
import graft.push.PushMaterializer
import org.apache.spark.sql.functions._

class DagRunnerSpec extends SparkTestBase {

  private def node(name: String, deps: String*) =
    DagNode(name, deps.toSet, _ => ())

  test("order: respects every dependency and is deterministic") {
    val nodes = Seq(
      node("push", "logs", "rollup"), node("rollup", "seed"),
      node("logs"), node("seed"), node("tasks"))
    val o = DagRunner.order(nodes).map(_.name)
    assert(o.indexOf("seed") < o.indexOf("rollup"))
    assert(o.indexOf("rollup") < o.indexOf("push"))
    assert(o.indexOf("logs") < o.indexOf("push"))
    // lexicographic among ready nodes -> one canonical order ("rollup"
    // becomes ready once "seed" runs and wins over "tasks"; then "push")
    assert(o === Seq("logs", "seed", "rollup", "push", "tasks"))
    assert(DagRunner.order(nodes.reverse).map(_.name) === o,
      "input order must not leak into the schedule")
  }

  test("order: unknown dependency and cycle are named errors") {
    val missing = intercept[IllegalArgumentException] {
      DagRunner.order(Seq(node("a", "ghost")))
    }
    assert(missing.getMessage.contains("ghost") && missing.getMessage.contains("'a'"))
    val cyclic = intercept[IllegalArgumentException] {
      DagRunner.order(Seq(node("a", "b"), node("b", "a"), node("z")))
    }
    assert(cyclic.getMessage.endsWith("a, b"),
      s"cycle must name exactly its members: ${cyclic.getMessage}")
    val dup = intercept[IllegalArgumentException] {
      DagRunner.order(Seq(node("a"), node("a")))
    }
    assert(dup.getMessage.contains("duplicate"))
  }

  test("runParallel: dependencies always finish before dependents start; all nodes run") {
    val log = scala.collection.mutable.Map.empty[String, (Long, Long)]
    def timed(name: String, deps: String*) = DagNode(name, deps.toSet, _ => {
      val s = System.nanoTime()
      Thread.sleep(20 + scala.util.Random.nextInt(30))
      log.synchronized { log(name) = (s, System.nanoTime()) }
    })
    val nodes = Seq(
      timed("a"), timed("b"), timed("c"),
      timed("d", "a", "b"), timed("e", "b", "c"), timed("f", "d", "e"))
    val done = DagRunner.runParallel(spark, nodes, threads = 3)
    assert(done.toSet === nodes.map(_.name).toSet)
    nodes.foreach { n =>
      n.deps.foreach { dep =>
        assert(log(dep)._2 <= log(n.name)._1,
          s"'$dep' must finish before '${n.name}' starts")
      }
    }
  }

  test("runParallel: a failing node rethrows and blocks its dependents") {
    val ran = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    def ok(name: String, deps: String*) =
      DagNode(name, deps.toSet, _ => { ran.add(name); () })
    val nodes = Seq(
      ok("seed"),
      DagNode("boom", Set("seed"), _ => throw new RuntimeException("model failed")),
      ok("downstream", "boom"))
    val e = intercept[RuntimeException] {
      DagRunner.runParallel(spark, nodes, threads = 2)
    }
    assert(e.getMessage === "model failed")
    assert(ran.contains("seed") && !ran.contains("downstream"))
  }

  test("a dbt-style project runs end-to-end in dependency order and stays idempotent") {
    val base = tmpDir("dag")
    val mat = new PushMaterializer(spark, base,
      new MockSalesforceBulkApi(), new MockSfmcApi())
    val executed = scala.collection.mutable.ArrayBuffer.empty[String]
    def tracked(n: DagNode): DagNode =
      n.copy(run = s => { executed += n.name; n.run(s) })

    // the reference DAG shape: seed -> rollup view; tracking tables and
    // rollup -> push model (accounts_load.sql:1-2 depends_on edges)
    val nodes = Seq(
      DagNode("customer_seed", Set.empty, s =>
        new graft.catalog.Catalog(s, sf).registerViews(Seq("customer"))),
      DagNode("rollup", Set("customer_seed"), s =>
        s.sql("""SELECT to_json(named_struct(
                |  'Name', c_name,
                |  'AccountID__c', CAST(c_custkey AS STRING))) AS record
                |FROM customer""".stripMargin)
          .createOrReplaceTempView("rollup")),
      DagNode("sfdc_load_tasks", Set.empty, _ => mat.sfdcTasks.createIfMissing()),
      DagNode("sfdc_load_task_logs", Set.empty, _ => { mat.sfdcLogs.read(); () }),
      DagNode("accounts_push",
        Set("rollup", "sfdc_load_tasks", "sfdc_load_task_logs"), s => {
          val model = PushModel("accounts_push",
            SalesforceConfig("Account", "insert"),
            sess => mat.unsyncedRecords(
              sess.table("rollup"), mat.sfdcLogs, "accounts_push"))
          mat.run(model)
        })).map(tracked(_))

    val order1 = DagRunner.run(spark, nodes)
    assert(executed.toSeq === order1)
    assert(order1.last === "accounts_push")
    assert(mat.sfdcLogs.read().count() === 150)
    assert(mat.sfdcTasks.read().count() === 1)

    // second dbt run: the anti-join finds nothing unsynced -> skip-empty,
    // no new log rows, no new task row
    executed.clear()
    DagRunner.run(spark, nodes)
    assert(mat.sfdcLogs.read().count() === 150)
    assert(mat.sfdcTasks.read().count() === 1)
  }
}
