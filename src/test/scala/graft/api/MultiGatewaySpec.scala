package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.SparkSpec
import graft.core.SchemaRegistry
import graft.store.EventStore

/** The r15 multi-driver story, end to end over live sockets: TWO
  * gateway instances — each with its OWN persistent [[SchemaRegistry]]
  * over one shared metastore dir, both writing one shared warehouse —
  * take concurrent collects carrying gateway-specific fields. Nothing
  * is shared in-process (separate registries, separate HTTP servers,
  * separate write locks), so what converges here is exactly the
  * cross-driver machinery: the registry's merge-under-file-lock
  * commit and the store's manifest CAS. The reference runs this
  * topology on Postgres (many collectors, one database); this is the
  * parquet restatement.
  *
  * Asserted: every event lands exactly once (a third, fresh registry
  * + manifest-pinned read), both gateways' schema doors answer the
  * converged union, and neither gateway 500s under the interleaving. */
class MultiGatewaySpec extends SparkSpec {

  private val client = HttpClient.newHttpClient()

  private def post(port: Int, path: String, body: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def get(port: Int, path: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path")).build(),
      HttpResponse.BodyHandlers.ofString())

  test("two gateways, one warehouse: concurrent ingest converges to " +
    "one union schema and an exactly-once store") {
    val warehouse = graft.TempDirs.scratch("graft-mgw-wh").toString
    val metaDir = graft.TempDirs.scratch("graft-mgw-meta").toString
    val r1 = SchemaRegistry.persistent(metaDir)
    val r2 = SchemaRegistry.persistent(metaDir)
    val gw1 = new HttpGateway(spark, r1, warehouse, "demo")
    val gw2 = new HttpGateway(spark, r2, warehouse, "demo")
    val p1 = gw1.start()
    val p2 = gw2.start()
    try {
      val n = 12 // per gateway; every event into ONE month partition
      val fail = new java.util.concurrent.atomic.AtomicReference[String]()
      def worker(port: Int, tag: String): Thread = new Thread(() => {
        try (0 until n).foreach { i =>
          val r = post(port, "/event/collect",
            s"""{"collection": "hits", "properties": {"_user": "$tag$i",
               |"_time": "2026-08-01 10:00:00.000", "eid": "$tag-$i",
               |"f_$tag": $i}}""".stripMargin.replace("\n", " "))
          if (r.statusCode() != 200)
            fail.compareAndSet(null, s"$tag#$i -> ${r.statusCode()}: ${r.body()}")
        } catch { case t: Throwable =>
          fail.compareAndSet(null, s"$tag threw: $t")
        }
      }, s"gateway-worker-$tag")
      val wa = worker(p1, "a"); val wb = worker(p2, "b")
      wa.start(); wb.start(); wa.join(); wb.join()
      assert(fail.get() == null, String.valueOf(fail.get()))

      // a third driver: fresh registry loaded from the shared
      // metastore, manifest-pinned read of the shared table
      val r3 = SchemaRegistry.persistent(metaDir)
      r3.load("demo")
      val fields = r3.schema("demo", "hits").get.map(_.name)
      assert(fields.contains("f_a") && fields.contains("f_b"),
        s"union schema lost a gateway's field: $fields")
      val eids = EventStore.read(spark, r3, warehouse, "demo", "hits")
        .select("eid").collect().map(_.getString(0))
      assert(eids.length == 2 * n && eids.toSet.size == 2 * n,
        s"expected ${2 * n} events exactly once, got ${eids.length} " +
          s"(${eids.length - eids.toSet.size} duplicated)")

      // one more collect through each gateway: a commit is also a
      // merge, so after it each instance's serving cache provably
      // holds the union (a gateway whose LAST commit predated the
      // other's would otherwise legitimately lag until its next write)
      assert(post(p1, "/event/collect",
        """{"collection": "hits", "properties": {"_user": "za", "_time": "2026-08-01 10:00:01.000", "eid": "za", "f_a": 99}}""")
        .statusCode() == 200)
      assert(post(p2, "/event/collect",
        """{"collection": "hits", "properties": {"_user": "zb", "_time": "2026-08-01 10:00:01.000", "eid": "zb", "f_b": 99}}""")
        .statusCode() == 200)

      // both gateways serve the converged schema over their own doors
      for (p <- Seq(p1, p2)) {
        val s = get(p, "/project/schema?collection=hits")
        assert(s.statusCode() == 200 &&
          s.body().contains("f_a") && s.body().contains("f_b"),
          s"gateway on $p serves a forked schema: ${s.body()}")
      }
    } finally { gw1.stop(); gw2.stop() }
  }

  test("profile ops from two gateways converge through the manifest " +
    "CAS (r17: __user_ops commits like an event table), and a same-id " +
    "subscription on a second instance never reuses the first's spool") {
    val warehouse = graft.TempDirs.scratch("graft-mgw-ops").toString
    val metaDir = graft.TempDirs.scratch("graft-mgw-ops-meta").toString
    val r1 = SchemaRegistry.persistent(metaDir)
    val r2 = SchemaRegistry.persistent(metaDir)
    val gw1 = new HttpGateway(spark, r1, warehouse, "demo")
    val gw2 = new HttpGateway(spark, r2, warehouse, "demo")
    val p1 = gw1.start()
    val p2 = gw2.start()
    try {
      // concurrent profile mutations from BOTH gateways: each append is
      // a staged-move + manifest CAS commit, so no interleaving can
      // lose an op (the old raw mode("append") relied on one JVM's
      // writeLock — exactly what two gateways don't share)
      val n = 6
      val fail = new java.util.concurrent.atomic.AtomicReference[String]()
      def mutator(port: Int, tag: String): Thread = new Thread(() => {
        try (0 until n).foreach { i =>
          val r = post(port, "/user/set_properties",
            s"""{"id": "u1", "time": ${1000 + i}, "properties": {"from_$tag$i": "$i"}}""")
          if (r.statusCode() != 200)
            fail.compareAndSet(null, s"$tag#$i -> ${r.statusCode()}")
        } catch { case t: Throwable =>
          fail.compareAndSet(null, s"$tag threw: $t")
        }
      }, s"mutator-$tag")
      val ma = mutator(p1, "a"); val mb = mutator(p2, "b")
      ma.start(); mb.start(); ma.join(); mb.join()
      assert(fail.get() == null, String.valueOf(fail.get()))
      // every op from both gateways folds into the profile, served
      // identically by either instance
      for (p <- Seq(p1, p2)) {
        val got = get(p, "/user/get?id=u1")
        assert(got.statusCode() == 200, got.body())
        (0 until n).foreach { i =>
          assert(got.body().contains(s"from_a$i") &&
            got.body().contains(s"from_b$i"),
            s"gateway on $p lost a concurrent op: ${got.body()}")
        }
      }
      // both instances pin the same ops-log head (2n CAS commits)
      val pins = Seq(p1, p2).map { p =>
        """"__user_ops":(\d+)""".r
          .findFirstMatchIn(get(p, "/admin/pin").body()).get.group(1).toLong
      }
      assert(pins.distinct.size == 1 && pins.head == 2L * n, s"pins: $pins")

      // spool isolation: subscription id "s" on gw1, then gw1 dies
      // (stop = crashed session; its spool stays on disk). The SAME id
      // created on gw2 must get its OWN spool — pre-r17 it reused the
      // orphan (a poisoned one made the id unusable, and in the live
      // case one instance's delete ripped the other's stream source)
      assert(post(p1, "/event/collect",
        """{"collection": "pv", "properties": {"_user": "u1", "_time": "2026-08-01 10:00:00.000", "page": "/x"}}""")
        .statusCode() == 200)
      assert(post(p1, "/subscription/create",
        """{"id": "s", "collection": "pv"}""").statusCode() == 200)
      assert(post(p1, "/subscription/poll?id=s", "").body().contains("/x"))
      gw1.stop()
      def spools(): Seq[String] = {
        val t = new java.io.File(s"$warehouse/demo/pv")
        Option(t.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isDirectory && f.getName.startsWith(".tail-s_"))
          .map(_.getName).toSeq.sorted
      }
      assert(spools().size == 1, s"spools after gw1 died: ${spools()}")
      // a collect through gw2 merge-commits its registry cache (the
      // first test pins that lag-until-next-write contract), so the
      // second instance now knows `pv` and can subscribe to it
      assert(post(p2, "/event/collect",
        """{"collection": "pv", "properties": {"_user": "u2", "_time": "2026-08-01 10:00:01.000", "page": "/y"}}""")
        .statusCode() == 200)
      val create2 = post(p2, "/subscription/create",
        """{"id": "s", "collection": "pv"}""")
      assert(create2.statusCode() == 200, create2.body())
      assert(spools().size == 2,
        s"gw2 reused the dead instance's spool: ${spools()}")
      val poll2 = post(p2, "/subscription/poll?id=s", "")
      assert(poll2.statusCode() == 200 && poll2.body().contains("/x") &&
        poll2.body().contains("/y"), poll2.body())
    } finally { gw1.stop(); gw2.stop() }
  }

  test("two gateways racing an MV refresh execute it once: the " +
    "maintenance fence claims (view, store head) cross-JVM") {
    val warehouse = graft.TempDirs.scratch("graft-mgw-mv").toString
    val metaDir = graft.TempDirs.scratch("graft-mgw-mv-meta").toString
    val r1 = SchemaRegistry.persistent(metaDir)
    val r2 = SchemaRegistry.persistent(metaDir)
    val gw1 = new HttpGateway(spark, r1, warehouse, "demo")
    val gw2 = new HttpGateway(spark, r2, warehouse, "demo")
    val p1 = gw1.start()
    val p2 = gw2.start()
    try {
      (0 until 4).foreach { i =>
        assert(post(p1, "/event/collect",
          s"""{"collection": "hits", "properties": {"_user": "u$i", "_time": "2026-08-01 10:00:00.000", "k": "g${i % 2}", "v": $i}}""")
          .statusCode() == 200)
      }
      assert(post(p1, "/materialized-view/create",
        """{"name": "m", "collection": "hits", "group": ["k"], "values": ["v"]}""")
        .statusCode() == 200)

      // both gateways race the refresh of the SAME store head
      val executed = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
      val threads = Seq(p1, p2, p1, p2).zipWithIndex.map { case (p, i) =>
        new Thread(() => {
          val r = post(p, "/materialized-view/refresh", """{"name": "m"}""")
          assert(r.statusCode() == 200, r.body())
          executed.add(r.body().contains("\"executed\":true"))
        }, s"refresher-$i")
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      import scala.jdk.CollectionConverters._
      assert(executed.asScala.count(identity) == 1,
        s"rebuild executed ${executed.asScala.count(identity)} times " +
          "across two gateways (want exactly 1)")

      // the view still serves correctly after the fenced rebuild…
      val g = get(p2, "/materialized-view/get?name=m")
      assert(g.statusCode() == 200 && g.body().contains("g0"), g.body())

      // …and NEW data advances the store head: the next refresh is a
      // fresh unit and executes again
      assert(post(p2, "/event/collect",
        """{"collection": "hits", "properties": {"_user": "u9", "_time": "2026-08-01 11:00:00.000", "k": "g0", "v": 9}}""")
        .statusCode() == 200)
      val again = post(p1, "/materialized-view/refresh", """{"name": "m"}""")
      assert(again.body().contains("\"executed\":true"), again.body())
    } finally { gw1.stop(); gw2.stop() }
  }
}
