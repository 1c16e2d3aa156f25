package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.{ConfigReload, TaskConfig}
import graft.sink.Discovery
import graft.sink.Discovery.{Replicas, Shards}

/** Control-plane logic: cluster-topology discovery diffing (mirrors the
  * reference's discovery_test.go:9-53 cases) and the config hot-reload
  * deep-diff (task/sinker.go:340-519 decision table).
  */
class ControlPlaneSpec extends AnyFunSuite {

  private val old1: Shards = Seq(
    Seq("127.0.0.1:8080", "127.0.0.1:8081"),
    Seq("127.0.0.1:8082", "127.0.0.1:8083"))

  test("diffShards matches the reference decision table") {
    // added shard -> changed
    val new1 = old1 :+ Seq("127.0.0.1:8084", "127.0.0.1:8085")
    assert(Discovery.diffShards(old1, new1))
    // shards swapped positionally -> changed (rows hash by shard index)
    val new2 = Seq(
      Seq("127.0.0.1:8082", "127.0.0.1:8083"),
      Seq("127.0.0.1:8081", "127.0.0.1:8080"))
    assert(Discovery.diffShards(old1, new2))
    // replica replaced -> changed
    val new3 = Seq(
      Seq("127.0.0.1:8082", "127.0.0.1:8083"),
      Seq("127.0.0.2:8081", "127.0.0.1:8080"))
    assert(Discovery.diffShards(old1, new3))
    // replicas reordered WITHIN each shard -> NOT a change
    val new4 = Seq(
      Seq("127.0.0.1:8081", "127.0.0.1:8080"),
      Seq("127.0.0.1:8083", "127.0.0.1:8082"))
    assert(!Discovery.diffShards(old1, new4))
  }

  test("cluster rows fold into ordered replica groups (discovery.go:81-106)") {
    val rows = Seq(
      (1, 1, "h1a"), (1, 2, "h1b"),
      (2, 1, "h2a"), (2, 2, "h2b"), (2, 3, "h2c"),
      (3, 1, "h3a"))
    assert(Discovery.shardsFromClusterRows(rows) ===
      Seq(Seq("h1a", "h1b"), Seq("h2a", "h2b", "h2c"), Seq("h3a")))
    assert(Discovery.shardsFromClusterRows(Nil) === Nil)
  }

  test("dispatcher publishes only on change") {
    var published = List.empty[Shards]
    val d = new Discovery.Dispatcher(old1, s => published ::= s)
    val sameRows = Seq(
      (1, 1, "127.0.0.1:8081"), (1, 2, "127.0.0.1:8080"),
      (2, 1, "127.0.0.1:8083"), (2, 2, "127.0.0.1:8082"))
    assert(!d.tick(sameRows)) // replica reorder only -> no publish
    assert(published.isEmpty)
    val grownRows = sameRows ++ Seq((3, 1, "127.0.0.1:8084"))
    assert(d.tick(grownRows))
    assert(published.head.size === 3)
    assert(d.currentHosts.size === 3)
    // empty topology (query hiccup) never publishes
    assert(!d.tick(Nil))
    assert(d.currentHosts.size === 3)
  }

  test("shardJdbcUrls builds per-shard multi-replica URLs (pool/conn.go:140-201)") {
    import graft.sink.ChSql
    // 3 shards x 2 replicas, rows deliberately out of order
    val topology = Seq(
      (2, 2, "ch2b", 8123), (1, 1, "ch1a", 8123), (3, 1, "ch3a", 8123),
      (1, 2, "ch1b", 8123), (2, 1, "ch2a", 8123), (3, 2, "ch3b", 8123))
    assert(ChSql.shardJdbcUrls(topology, "analytics") === Map(
      1 -> "jdbc:clickhouse://ch1a:8123,ch1b:8123/analytics",
      2 -> "jdbc:clickhouse://ch2a:8123,ch2b:8123/analytics",
      3 -> "jdbc:clickhouse://ch3a:8123,ch3b:8123/analytics"))
    // connection params render as a deterministic (sorted) query string
    val withParams = ChSql.shardJdbcUrls(Seq((1, 1, "h", 9000)), "db",
      Map("ssl" -> "true", "connect_timeout" -> "30"))
    assert(withParams(1) === "jdbc:clickhouse://h:9000/db?connect_timeout=30&ssl=true")
    // percent encoding, not form encoding: a space must be %20, never '+'
    // (a driver that percent-decodes would read the literal '+')
    val spaced = ChSql.shardJdbcUrls(Seq((1, 1, "h", 9000)), "db",
      Map("custom_settings" -> "max_threads = 4"))
    assert(spaced(1) ===
      "jdbc:clickhouse://h:9000/db?custom_settings=max_threads%20%3D%204")
    assert(ChSql.shardJdbcUrls(Nil, "db") === Map.empty)
  }

  private def task(name: String, group: String, topic: String,
      buf: Int = 1024): TaskConfig =
    TaskConfig(name = name, topic = topic, consumerGroup = group,
      bufferSize = buf)

  test("reload: kafka/clickhouse section change restarts everything") {
    val oldT = Seq(task("t1", "g1", "top1"), task("t2", "g2", "top2"))
    val p = ConfigReload.plan(oldT, oldT, globalSectionChanged = true)
    assert(p.restartAll)
    assert(p.stopTasks === Seq("t1", "t2") && p.startTasks === Seq("t1", "t2"))
  }

  test("reload: identical config is a no-op") {
    val t = Seq(task("t1", "g1", "top1"))
    assert(ConfigReload.plan(t, t).isNoop)
  }

  test("reload: only the changed task restarts inside an unchanged group") {
    val oldT = Seq(task("t1", "g1", "top1"), task("t2", "g1", "top2"),
      task("t3", "g2", "top3"))
    val newT = Seq(task("t1", "g1", "top1"), task("t2", "g1", "top2", buf = 9999),
      task("t3", "g2", "top3"))
    val p = ConfigReload.plan(oldT, newT)
    assert(!p.restartAll)
    assert(p.stopTasks.isEmpty && p.startTasks.isEmpty)
    assert(p.restartTasks === Seq("t2"))
  }

  test("reload: a group whose topic set changed bounces whole; removed group stops") {
    val oldT = Seq(task("t1", "g1", "top1"), task("t2", "g1", "top2"),
      task("t3", "g2", "top3"))
    val newT = Seq(task("t1", "g1", "top1"), task("t2", "g1", "topX"),
      task("t4", "g3", "top4"))
    val p = ConfigReload.plan(oldT, newT)
    assert(p.stopTasks.sorted === Seq("t1", "t2", "t3"))
    assert(p.startTasks.sorted === Seq("t1", "t2", "t4"))
    assert(p.restartTasks.isEmpty)
  }

  test("reload: task added to an existing group starts alone") {
    val oldT = Seq(task("t1", "g1", "top1"))
    val newT = Seq(task("t1", "g1", "top1"), task("t2", "g1", "top1"))
    val p = ConfigReload.plan(oldT, newT)
    // same topic set (top1 twice vs once differs!) -> actually the
    // subscription grew, so the consumer bounces — mirror group logic
    assert(p.stopTasks === Seq("t1") && p.startTasks.sorted === Seq("t1", "t2"))
  }
}
