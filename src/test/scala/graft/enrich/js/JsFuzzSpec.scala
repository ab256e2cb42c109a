package graft.enrich.js

import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-input contract for the script doors: whatever bytes a
  * client posts to /custom-event-mapper or /event/hook, the ONLY
  * things allowed to escape the engine are [[MiniJs.JsException]]
  * (invalid script / script-level error) and
  * [[MiniJs.SandboxViolation]] (resource caps). A MatchError,
  * StackOverflowError, or NPE here would kill the gateway handler (or
  * a Spark task) on one hostile registration. Seeded, so failures
  * reproduce. */
class JsFuzzSpec extends AnyFunSuite {

  private val corpus = Seq(
    """function f(a, b = 1) { return a + b; }""",
    """class A { constructor(x) { this.x = x; } m() { return this.x; } }
      |class B extends A { m() { return super.m() + 1; } }
      |function f() { return new B(41).m(); }""".stripMargin,
    """var {a, b: c = 2} = {a: 1}; var [x = 5] = [];
      |function f() { return `${a}:${c}:${x}`; }""".stripMargin,
    """function f(s) {
      |  try { return JSON.parse(s).k; }
      |  catch (e) { return e instanceof Error ? e.message : 'x'; }
      |}""".stripMargin,
    """function f() {
      |  var out = [];
      |  for (var i = 0; i < 10; i++) { if (i % 2 in {0: 1}) out.push(i); }
      |  return out.map(x => x * 2).join(',');
      |}""".stripMargin,
    """function f(u) { return /^[a-z]+@ex\.com$/i.test(u) ? 'ok' : 'no'; }""",
    // round-11 surface: object-literal accessors, class expressions,
    // new.target, static inheritance — mutants must keep erroring
    // cleanly through the new parse/eval paths
    """function f() {
      |  var o = { c: 1, get d() { return this.c + 1; }, set d(v) { this.c = v; } };
      |  o.d = 5; return o.d;
      |}""".stripMargin,
    """class Base { m() { return 'b'; } }
      |var C = class Named extends Base { m() { return super.m() + typeof Named; } };
      |function f() { return new C().m(); }""".stripMargin,
    """class A { static k() { return new.target === undefined; } }
      |class B extends A {}
      |function f() { return B.k(); }""".stripMargin)

  private def mutate(src: String, rnd: scala.util.Random): String = {
    val chars = "(){}[];,.:?=+-*/%<>!&|^~'\"`$\\ \nabz019_#@"
    val n = 1 + rnd.nextInt(4)
    var s = src
    (0 until n).foreach { _ =>
      if (s.isEmpty) s = "" + chars(rnd.nextInt(chars.length))
      else rnd.nextInt(4) match {
        case 0 => // insert a random char
          val p = rnd.nextInt(s.length)
          s = s.substring(0, p) + chars(rnd.nextInt(chars.length)) + s.substring(p)
        case 1 => // delete a span
          val p = rnd.nextInt(s.length)
          val len = 1 + rnd.nextInt(math.min(8, s.length - p))
          s = s.substring(0, p) + s.substring(p + len)
        case 2 => // duplicate a span elsewhere
          val p = rnd.nextInt(s.length)
          val len = 1 + rnd.nextInt(math.min(12, s.length - p))
          val q = rnd.nextInt(s.length)
          s = s.substring(0, q) + s.substring(p, p + len) + s.substring(q)
        case 3 => // swap two chars
          val p = rnd.nextInt(s.length); val q = rnd.nextInt(s.length)
          val arr = s.toCharArray
          val t = arr(p); arr(p) = arr(q); arr(q) = t
          s = new String(arr)
      }
    }
    s
  }

  test("mutated scripts only ever throw JsException / SandboxViolation") {
    val rnd = new scala.util.Random(20260814L)
    var parsed = 0
    (0 until 1500).foreach { i =>
      val src = mutate(corpus(i % corpus.length), rnd)
      try {
        val eng = new JsEngine(src, Map.empty, maxSteps = 20000)
        eng.invoke("f", "in@ex.com")
        parsed += 1
      } catch {
        case _: MiniJs.JsException | _: MiniJs.SandboxViolation => ()
        case t: Throwable =>
          fail(s"iteration $i leaked ${t.getClass.getName}: " +
            s"${t.getMessage}\n--- script ---\n$src")
      }
    }
    // the mutator must not be so destructive that nothing survives —
    // a healthy run still executes a good fraction of mutants
    assert(parsed > 50, s"only $parsed/1500 mutants executed — fuzz too weak")
  }

  test("random byte soup never leaks a non-sandbox Throwable") {
    val rnd = new scala.util.Random(99L)
    (0 until 500).foreach { i =>
      val len = rnd.nextInt(120)
      val src = new String(Array.fill(len)((rnd.nextInt(95) + 32).toChar))
      try { new JsEngine(src, Map.empty, maxSteps = 5000).invoke("f") }
      catch {
        case _: MiniJs.JsException | _: MiniJs.SandboxViolation => ()
        case t: Throwable =>
          fail(s"iteration $i leaked ${t.getClass.getName}: " +
            s"${t.getMessage}\n--- script ---\n$src")
      }
    }
  }
}
