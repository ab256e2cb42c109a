package graft.enrich

import graft.SparkSpec
import graft.core.FieldType
import graft.enrich.js._
import org.apache.spark.sql.functions._

/** The JS mapper surface (M7/S7): engine semantics, the sandbox
  * rejections the reference enforces via Nashorn flags + binding
  * removal (JSCodeCompiler.java:44-120, TestJSCodeCompiler), and the
  * mapper/webhook contracts end-to-end over DataFrames. */
class JsEngineSpec extends SparkSpec {

  private def run(code: String, fn: String, args: Any*): Any =
    JsCodeCompiler.createEngine(code).invoke(fn, args: _*)

  test("compile + invoke: arithmetic, strings, control flow, closures") {
    assert(run("function f(a, b) { return a + b * 2; }", "f", 3L, 4L) == 11L)
    assert(run("function f(s) { return s.toUpperCase() + '!'; }", "f", "hey") == "HEY!")
    assert(run(
      """function f(n) {
        |  var total = 0;
        |  for (var i = 1; i <= n; i++) { if (i % 2 == 0) { total += i; } }
        |  return total;
        |}""".stripMargin, "f", 10L) == 30L)
    assert(run(
      """function mk(x) { return function(y) { return x + y; }; }
        |function f() { var add5 = mk(5); return add5(37); }""".stripMargin,
      "f") == 42L)
    assert(run(
      """function f() {
        |  var o = {a: 1, b: {c: [10, 20, 30]}};
        |  o.b.c[1] = o.b.c[1] + o.a;
        |  return o.b.c.join('-');
        |}""".stripMargin, "f") == "10-21-30")
  }

  test("integral identity survives get/set round-trips") {
    // pure-double JS would corrupt large ids; Long is preserved until a
    // division forces a double
    assert(run("function f(id) { return id; }", "f", 9007199254740995L) ==
      9007199254740995L)
    assert(run("function f(a) { return a / 2; }", "f", 5L) == 2.5)
  }

  test("sandbox: host escapes are rejected like the reference's removed bindings") {
    for (bad <- Seq("Java.type('java.lang.Runtime')", "load('x.js')",
        "exit()", "quit()", "print('x')", "readLine()", "eval('1')",
        "loadWithNewGlobal('x')")) {
      val e = intercept[Exception](run(s"function f() { return $bad; }", "f"))
      assert(e.isInstanceOf[MiniJs.SandboxViolation] ||
        e.getMessage.contains("not defined"), s"$bad: ${e.getMessage}")
    }
  }

  test("sandbox: runaway loops hit the step budget") {
    val e = intercept[MiniJs.SandboxViolation](
      JsCodeCompiler.createEngine(
        "function f() { while (true) { var x = 1; } }", maxSteps = 10000)
        .invoke("f"))
    assert(e.getMessage.contains("step budget"))
    val r = intercept[MiniJs.SandboxViolation](
      run("function f() { return f(); }", "f"))
    assert(r.getMessage.contains("recursion"))
  }

  test("bindings: util.crypt/base64, config set-once, logger collect") {
    assert(run("function f(s) { return util.base64.encode(s); }", "f", "hi") ==
      "aGk=")
    assert(run("function f(s) { return util.base64.decode(util.base64.encode(s)); }",
      "f", "round") == "round")
    assert(run("function f(s) { return util.crypt.sha256(s); }", "f", "x") ==
      "2d711642b726b04401627ca9fbac32f5c8530fb1903cc4db02258717921a4881")
    val cfg = new JsCodeCompiler.JsConfig
    val logger = new JsCodeCompiler.JsLogger
    JsCodeCompiler.createEngine(
      """function f() {
        |  config.setOnce('k', 'first'); config.setOnce('k', 'second');
        |  logger.info('ran', config.get('k'));
        |  return config.get('k');
        |}""".stripMargin, logger = logger, config = cfg).invoke("f")
    assert(cfg.values("k") == "first")
    assert(logger.entries == Seq("info" -> "ran first"))
  }

  test("string indexes clamp per JS semantics — odd event values degrade, never throw") {
    // charAt out of range → '', not StringIndexOutOfBoundsException
    assert(run("function f(s) { return s.charAt(5); }", "f", "ab") == "")
    assert(run("function f(s) { return s.charAt(-1); }", "f", "ab") == "")
    assert(run("function f(s) { return s.charAt(1); }", "f", "ab") == "b")
    // substring clamps BOTH ends and swaps when start > end
    assert(run("function f(s) { return s.substring(1, 99); }", "f", "abcd") == "bcd")
    assert(run("function f(s) { return s.substring(-3, 2); }", "f", "abcd") == "ab")
    assert(run("function f(s) { return s.substring(3, 1); }", "f", "abcd") == "bc")
    assert(run("function f(s) { return s.substring(9); }", "f", "ab") == "")
    // slice maps negatives from the end and clamps
    assert(run("function f(s) { return s.slice(-2); }", "f", "abcd") == "cd")
    assert(run("function f(s) { return s.slice(1, -1); }", "f", "abcd") == "bc")
    assert(run("function f(s) { return s.slice(3, 1); }", "f", "abcd") == "")
    assert(run("function f(s) { return s.slice(0, 99); }", "f", "ab") == "ab")
    // array slice with negatives
    assert(run("function f() { return [1,2,3,4].slice(-2).join(','); }", "f") == "3,4")
    // NaN-ish index → 0, still no escape
    assert(run("function f(s) { return s.substring('x'); }", "f", "ab") == "ab")
  }

  test("sparse array growth honors the step budget and a hard length cap") {
    // an absurd index is a sandbox violation outright, caught instantly
    val e = intercept[MiniJs.SandboxViolation](
      run("function f() { var a = []; a[2000000000] = 1; return a.length; }", "f"))
    assert(e.getMessage.contains("out of sandbox bounds"))
    // growth below the cap is metered by the step budget, so a small
    // budget stops a large (but in-bounds) fill rather than wedging
    val b = intercept[MiniJs.SandboxViolation](
      JsCodeCompiler.createEngine(
        "function f() { var a = []; a[500000] = 1; return a.length; }",
        maxSteps = 10000).invoke("f"))
    assert(b.getMessage.contains("step budget"))
    // normal in-bounds sparse assignment still works
    assert(run("function f() { var a = [1]; a[3] = 9; return a.length; }", "f") == 4L)
    // a data-dependent NEGATIVE index (indexOf miss - 1) is a harmless
    // property write in JS — must not kill the task
    assert(run(
      "function f(s) { var a = [1, 2]; a[s.indexOf('x') - 1] = 9; return a.length; }",
      "f", "no-match-here") == 2L)
  }

  test("replace replaces FIRST occurrence only; replaceAll, charCodeAt, repeat") {
    assert(run("function f(s) { return s.replace('a', 'b'); }", "f", "aaa") == "baa")
    assert(run("function f(s) { return s.replace('zz', 'b'); }", "f", "aaa") == "aaa")
    assert(run("function f(s) { return s.replaceAll('a', 'b'); }", "f", "aaa") == "bbb")
    assert(run("function f(s) { return s.charCodeAt(0); }", "f", "A") == 65L)
    def isNaN(v: Any) = v match {
      case d: Double => java.lang.Double.isNaN(d); case _ => false
    }
    assert(isNaN(run("function f(s) { return s.charCodeAt(9); }", "f", "A")))
    assert(run("function f(s) { return s.repeat(3); }", "f", "ab") == "ababab")
    // allocation bomb via repeat hits the sandbox, not the heap
    val e = intercept[MiniJs.SandboxViolation](
      run("function f(s) { return s.repeat(2000000000); }", "f", "xx"))
    assert(e.getMessage.contains("sandbox"))
  }

  test("try/catch/finally/throw: script values, runtime errors as Error " +
    "objects, finally always runs, sandbox caps stay uncatchable") {
    // throw a value, catch binds it
    assert(run(
      """function f(x) {
        |  try { if (x > 10) { throw 'too big'; } return 'ok'; }
        |  catch (e) { return 'caught ' + e; }
        |}""".stripMargin, "f", 99L) == "caught too big")
    // runtime error (JSON.parse on junk) surfaces as an Error object
    // with name/message — the Nashorn shape mapper scripts test against
    assert(run(
      """function f(s) {
        |  try { return JSON.parse(s).a; }
        |  catch (e) { return e.name + ': fallback'; }
        |}""".stripMargin, "f", "{not json") == "Error: fallback")
    // finally runs on both paths; ES2019 optional catch binding parses
    assert(run(
      """function f(x) {
        |  var log = [];
        |  try { log.push('try'); if (x) { throw {code: 7}; } }
        |  catch { log.push('catch'); }
        |  finally { log.push('finally'); }
        |  return log.join(',');
        |}""".stripMargin, "f", true) == "try,catch,finally")
    // an uncaught script throw reaches the host as a JsException (with
    // the error object's message), never a raw control exception
    val e = intercept[MiniJs.JsException](run(
      "function f() { throw {name: 'TypeError', message: 'bad arg'}; }", "f"))
    assert(e.getMessage.contains("TypeError") && e.getMessage.contains("bad arg"))
    // the step budget must not be swallowed by a script catch
    intercept[MiniJs.SandboxViolation] {
      JsCodeCompiler.createEngine(
        """function f() {
          |  try { while (true) { var x = 1; } }
          |  catch (e) { return 'swallowed'; }
          |}""".stripMargin, maxSteps = 10000).invoke("f")
    }
  }

  test("for..of iterates array VALUES and string characters") {
    assert(run(
      """function f(a) {
        |  var total = 0;
        |  for (var v of a) { total += v; }
        |  return total;
        |}""".stripMargin, "f", Seq(1L, 2L, 3L, 4L)) == 10L)
    assert(run(
      """function f(s) {
        |  var out = [];
        |  for (var ch of s) { out.push(ch.toUpperCase()); }
        |  return out.join('.');
        |}""".stripMargin, "f", "abc") == "A.B.C")
    // break/continue work inside for..of
    assert(run(
      """function f(a) {
        |  var n = 0;
        |  for (var v of a) { if (v == 2) { continue; } if (v > 3) { break; } n += v; }
        |  return n;
        |}""".stripMargin, "f", Seq(1L, 2L, 3L, 9L, 9L)) == 4L)
  }

  test("regex literals: test/exec/match/replace/split/search, flags, " +
    "division stays division") {
    assert(run("function f(s) { return /^[a-z]+@[a-z]+\\.[a-z]+$/.test(s); }",
      "f", "dev@example.com") == true)
    assert(run("function f(s) { return /^\\d+$/.test(s); }", "f", "12a") == false)
    // case-insensitive flag
    assert(run("function f(s) { return /firefox/i.test(s); }",
      "f", "Mozilla Firefox/117") == true)
    // exec: [full, group...]; unmatched → null
    assert(run(
      """function f(ua) {
        |  var m = /Chrome\/(\d+)/.exec(ua);
        |  return m ? m[1] : 'unknown';
        |}""".stripMargin, "f", "Mozilla Chrome/117.0 Safari") == "117")
    assert(run(
      """function f(ua) {
        |  var m = /Chrome\/(\d+)/.exec(ua);
        |  return m ? m[1] : 'unknown';
        |}""".stripMargin, "f", "curl/8.0") == "unknown")
    // replace: first-only without g, all with g, $n expansion
    assert(run("function f(s) { return s.replace(/o/, '0'); }", "f", "foo") == "f0o")
    assert(run("function f(s) { return s.replace(/o/g, '0'); }", "f", "foo") == "f00")
    assert(run(
      "function f(s) { return s.replace(/(\\w+)@(\\w+)/, '$2 at $1'); }",
      "f", "dev@example") == "example at dev")
    // function replacement gets (match, groups.., offset, string)
    assert(run(
      """function f(s) {
        |  return s.replace(/\d+/g, function(m) { return m * 2; });
        |}""".stripMargin, "f", "a1b10") == "a2b20")
    // split on a regex; match with g collects every match
    assert(run("function f(s) { return s.split(/[,;]\\s*/).join('|'); }",
      "f", "a, b;c") == "a|b|c")
    assert(run(
      "function f(s) { var m = s.match(/\\d+/g); return m ? m.join('-') : ''; }",
      "f", "a1b22c333") == "1-22-333")
    assert(run("function f(s) { return s.search(/b+/); }", "f", "aabba") == 2L)
    // the lexer must still read division where a value precedes '/'
    assert(run("function f(a, b) { return a / b / 2; }", "f", 20L, 2L) == 5.0)
    // ...including after a postfix increment: `x++ / 2` is division,
    // never the start of a regex literal
    assert(run("function f(x) { var y = x++ / 2; return y + x; }",
      "f", 8L) == 13.0)
    // catastrophically long patterns are a sandbox violation
    intercept[MiniJs.SandboxViolation] {
      run(s"function f(s) { return s.match('${"(a|b)" * 300}'); }", "f", "x")
    }
  }

  test("realistic Nashorn-style mapper: UTM extraction with regex + " +
    "try/catch over a referrer field") {
    // the shape a reference user writes against the EventsProxy contract:
    // defensive parse, regex extraction, for..of accumulation
    val script =
      """function extract(url) {
        |  try {
        |    var m = url.match(/[?&]utm_source=([^&]+)/);
        |    if (m) { return m[1]; }
        |    if (/^https?:\/\/(www\.)?google\./.test(url)) { throw 'search'; }
        |    return 'direct';
        |  } catch (e) {
        |    return e == 'search' ? 'organic' : 'unknown';
        |  }
        |}
        |function f(urls) {
        |  var out = [];
        |  for (var u of urls) { out.push(extract(u)); }
        |  return out.join(',');
        |}""".stripMargin
    assert(run(script, "f", Seq(
      "https://x.com/p?utm_source=newsletter&c=1",
      "https://www.google.com/search?q=rakam",
      "https://example.com/landing")) == "newsletter,organic,direct")
  }

  test("stdlib breadth: array sort/reduce/find family, Object.*, " +
    "string padding, toFixed, Date.now") {
    // JS default sort is lexicographic; comparator sorts numerically
    assert(run("function f() { return [10, 9, 1].sort().join(','); }", "f")
      == "1,10,9")
    assert(run(
      "function f() { return [10, 9, 1].sort(function(a, b) { return a - b; }).join(','); }",
      "f") == "1,9,10")
    // an intransitive comparator (NaN on a mixed array) must surface
    // as a CATCHABLE script error, never a raw JVM exception escaping
    // the sandbox (TimSort's contract violation on large inputs)
    assert(run(
      """function f() {
        |  var a = [];
        |  for (var i = 0; i < 64; i++) { a.push(i % 7 == 3 ? 'x' : i); }
        |  try { a.sort(function(p, q) { return p - q; }); return 'sorted'; }
        |  catch (e) { return 'caught'; }
        |}""".stripMargin, "f").isInstanceOf[String])
    assert(run(
      "function f(a) { return a.reduce(function(s, x) { return s + x; }, 100); }",
      "f", Seq(1L, 2L, 3L)) == 106L)
    assert(run(
      "function f(a) { return a.find(function(x) { return x > 1; }); }",
      "f", Seq(1L, 5L, 9L)) == 5L)
    assert(run(
      "function f(a) { return a.some(function(x) { return x > 8; }); }",
      "f", Seq(1L, 9L)) == true)
    assert(run(
      "function f(a) { return a.every(function(x) { return x > 0; }); }",
      "f", Seq(1L, 9L)) == true)
    assert(run("function f(a) { a.unshift(0); return a.shift(); }",
      "f", Seq(1L)) == 0L)
    // Object.* over an event body
    assert(run(
      """function f(o) {
        |  var ks = Object.keys(o).sort().join(',');
        |  var total = Object.values(o).reduce(function(s, v) { return s + v; }, 0);
        |  return ks + '=' + total;
        |}""".stripMargin, "f", Map("b" -> 2L, "a" -> 1L)) == "a,b=3")
    assert(run(
      """function f() {
        |  var t = {a: 1};
        |  Object.assign(t, {b: 2}, {a: 9});
        |  return JSON.stringify(t);
        |}""".stripMargin, "f") == """{"a":9,"b":2}""")
    // string padding + number formatting (the report-shaping idioms)
    assert(run("function f(s) { return s.padStart(5, '0'); }", "f", "42") == "00042")
    assert(run("function f(s) { return s.padEnd(4, '.') + '!'; }", "f", "ab") == "ab..!")
    assert(run("function f(x) { return (x / 3).toFixed(2); }", "f", 10L) == "3.33")
    // Date.now is epoch millis (the mapper timestamping idiom)
    val now = run("function f() { return Date.now(); }", "f").asInstanceOf[Long]
    assert(math.abs(now - System.currentTimeMillis()) < 60_000L)
    // an absurd pad target cannot allocate unbounded memory
    intercept[MiniJs.SandboxViolation] {
      run("function f(s) { return s.padStart(99999999); }", "f", "x")
    }
  }

  test("for-in iterates object keys and array indices; null is a no-op") {
    assert(run(
      """function f() {
        |  var o = {a: 1, b: 2, c: 3};
        |  var ks = [];
        |  for (var k in o) { ks.push(k + '=' + o[k]); }
        |  return ks.join(',');
        |}""".stripMargin, "f") == "a=1,b=2,c=3")
    assert(run(
      """function f() {
        |  var a = ['x', 'y', 'z'];
        |  var total = '';
        |  for (var i in a) { if (a[i] === 'y') { continue; } total += a[i]; }
        |  return total;
        |}""".stripMargin, "f") == "xz")
    assert(run(
      "function f(v) { var n = 0; for (var k in v) { n++; } return n; }",
      "f", null) == 0L)
  }

  test("array concat/map/filter/forEach/includes with closures") {
    assert(run(
      "function f() { return [1, 2].concat([3, 4], 5).join('-'); }",
      "f") == "1-2-3-4-5")
    assert(run(
      "function f() { return [1, 2, 3].map(function(x) { return x * 10; }).join(','); }",
      "f") == "10,20,30")
    assert(run(
      "function f() { return [1, 2, 3, 4].filter(function(x) { return x % 2 == 0; }).join(','); }",
      "f") == "2,4")
    assert(run(
      """function f() {
        |  var sum = 0;
        |  [5, 6, 7].forEach(function(x, i) { sum += x * (i + 1); });
        |  return sum;
        |}""".stripMargin, "f") == 38L)
    assert(run("function f() { return [1, 'a'].includes('a'); }", "f") == true)
    // callbacks are metered: a huge mapped array still hits the budget
    val e = intercept[MiniJs.SandboxViolation](
      JsCodeCompiler.createEngine(
        """function f() {
          |  var a = [];
          |  for (var i = 0; i < 100000; i++) { a.push(i); }
          |  return a.map(function(x) { return x * 2; }).length;
          |}""".stripMargin, maxSteps = 1000).invoke("f"))
    assert(e.getMessage.contains("step budget"))
  }

  test("postfix ++ yields the OLD value, prefix the new (JS semantics)") {
    assert(run("function f() { var i = 5; var x = i++; return x * 10 + i; }",
      "f") == 56L) // x = 5 (old), i = 6
    assert(run("function f() { var i = 5; var x = ++i; return x * 10 + i; }",
      "f") == 66L) // x = 6 (new), i = 6
    assert(run("function f() { var i = 5; var x = i--; return x * 10 + i; }",
      "f") == 54L)
    // the canonical idiom: a[i++] writes at the pre-increment slot
    assert(run(
      "function f() { var a = []; var i = 0; a[i++] = 'x'; a[i++] = 'y'; return a.join(''); }",
      "f") == "xy")
  }

  test("pathological nesting is a parse error, not a StackOverflowError") {
    // StackOverflowError is an Error — it escapes every catch and kills
    // the executor; the parser must reject absurd nesting as a plain
    // JsException at compile (registration) time instead
    val deepParens = "function f() { return " + "(" * 5000 + "1" + ")" * 5000 + "; }"
    val e1 = intercept[MiniJs.JsException](MiniJs.parse(deepParens))
    assert(e1.getMessage.contains("nesting too deep"))
    val deepBlocks = "function f() { " + "{" * 5000 + "}" * 5000 + " }"
    val e2 = intercept[MiniJs.JsException](MiniJs.parse(deepBlocks))
    assert(e2.getMessage.contains("nesting too deep"))
    // sane nesting still parses and runs
    assert(run("function f() { return ((((1 + 2)))); }", "f") == 3L)
  }

  test("template literals: interpolation, escapes, expressions, division after") {
    assert(run("function f(x) { return `id=${x}`; }", "f", 7L) == "id=7")
    assert(run("function f() { return ``; }", "f") == "")
    assert(run("function f(a, b) { return `${a} and ${b}!`; }",
      "f", "salt", "pepper") == "salt and pepper!")
    // a full expression (with nested braces via an object literal)
    // inside ${}, numeric results stringified by the concat desugar
    assert(run(
      """function f(n) { return `sum=${n * 2 + 1} obj=${({k: 9}).k}`; }""",
      "f", 3L) == "sum=7 obj=9")
    // escapes: \` keeps a literal backtick, \$ defuses interpolation,
    // \n cooks to a newline
    assert(run("function f() { return `a\\`b\\${x}c\\nd`; }", "f")
      == "a`b${x}c\nd")
    // a template is value-shaped: the / after it must lex as division
    assert(run("function f() { return `${8}`.length / 1; }", "f") == 1L)
    // ternary inside ${} — the ':' must not confuse the sub-parser
    assert(run("function f(x) { return `${x > 2 ? 'big' : 'small'}`; }",
      "f", 5L) == "big")
    val e = intercept[MiniJs.JsException](
      MiniJs.parse("var s = `outer ${ `inner` }`;"))
    assert(e.getMessage.contains("nested template"))
  }

  test("hex escapes decode in strings and templates; malformed ones error") {
    // A cooks to 'A' (the old lexer mangled it to the text u0041),
    // \x2d to '-' — in both ordinary literals and templates
    assert(run("function f() { return '\\u0041\\x2d\\u00e9'; }", "f") == "A-é")
    assert(run("function f() { return `\\u0041${1}\\x2d`; }", "f") == "A1-")
    // a malformed hex escape is a parse error, never a silent mangle
    val e1 = intercept[MiniJs.JsException](
      MiniJs.parse("var s = '\\uZZ';"))
    assert(e1.getMessage.contains("\\u escape"))
    val e2 = intercept[MiniJs.JsException](
      MiniJs.parse("var s = `\\x1`;"))
    assert(e2.getMessage.contains("\\x escape"))
    // NUL would collide with the template token encoding — rejected
    val e3 = intercept[MiniJs.JsException](
      MiniJs.parse("var s = `\\u0000`;"))
    assert(e3.getMessage.contains("NUL"))
    // …but is fine in an ordinary string literal
    assert(run("function f() { return '\\u0000'.length; }", "f") == 1L)
  }

  test("new Array(non-integer length) is a catchable RangeError") {
    val e = intercept[MiniJs.JsException](
      run("function f() { return new Array(1.5).length; }", "f"))
    assert(e.getMessage.contains("RangeError"))
    // catchable from script, with the JS error shape
    assert(run(
      """function f() {
        |  try { new Array(2.5); return 'no-throw'; }
        |  catch (e) { return e.name + ':' + e.message; }
        |}""".stripMargin, "f") == "RangeError:invalid array length")
    // whole doubles still construct (JS allows new Array(3.0))
    assert(run("function f() { return new Array(3.0).length; }", "f") == 3L)
  }

  test("destructuring var declarations: object, rename, defaults, array") {
    assert(run(
      """function f(o) { var {a, b} = o; return a + b; }""",
      "f", Map("a" -> 3L, "b" -> 4L)) == 7L)
    assert(run(
      """function f(o) { var {a: x, b: y} = o; return x * y; }""",
      "f", Map("a" -> 3L, "b" -> 4L)) == 12L)
    // default applies ONLY when the property is undefined — 0 is kept
    assert(run(
      """function f(o) { var {a = 99, c = 5} = o; return a + c; }""",
      "f", Map("a" -> 0L)) == 5L)
    assert(run(
      """function f() { var [x, y, z = 10] = [1, 2]; return x + y + z; }""",
      "f") == 13L)
    // let/const route through the same declaration path
    assert(run(
      """function f(o) { let {a} = o; const [b] = [a + 1]; return b; }""",
      "f", Map("a" -> 41L)) == 42L)
    // the RHS is evaluated exactly once
    assert(run(
      """var n = 0;
        |function mk() { n += 1; return {a: 1, b: 2}; }
        |function f() { var {a, b} = mk(); return n * 10 + a + b; }""".stripMargin,
      "f") == 13L)
    val e = intercept[MiniJs.JsException](
      MiniJs.parse("var {a, b};"))
    assert(e.getMessage.contains("initializer"))
  }

  test("arrow functions: expression and block bodies, closures, callbacks") {
    assert(run("function f() { var inc = x => x + 1; return inc(41); }",
      "f") == 42L)
    assert(run("function f() { var add = (a, b) => a + b; return add(2, 3); }",
      "f") == 5L)
    assert(run(
      """function f() {
        |  var fact = n => { if (n <= 1) { return 1; } return n * fact(n - 1); };
        |  return fact(5);
        |}""".stripMargin, "f") == 120L)
    // zero-arg form and closure capture
    assert(run(
      """function f() { var x = 7; var g = () => x * 2; x = 10; return g(); }""",
      "f") == 20L)
    // as a callback to the array stdlib — the dominant real-world use
    assert(run(
      "function f() { return [1, 2, 3].map(v => v * v).filter(v => v > 2).join(','); }",
      "f") == "4,9")
    // parenthesized NON-arrow expressions still parse as expressions
    assert(run("function f(a) { return (a) + 1; }", "f", 1L) == 2L)
    assert(run("function f(a) { return (a >= 2) ? 'y' : 'n'; }", "f", 3L) == "y")
  }

  test("new Date: injectable UTC clock, parsing, fields, arithmetic, " +
    "Invalid Date degrades") {
    // 2023-11-14T22:13:20.000Z
    val fixed = 1_700_000_000_000L
    def runAt(code: String, fn: String, args: Any*): Any =
      JsCodeCompiler.createEngine(code, now = () => fixed).invoke(fn, args: _*)
    assert(runAt("function f() { return Date.now(); }", "f") == fixed)
    assert(runAt("function f() { return new Date().getTime(); }", "f") == fixed)
    assert(runAt(
      """function f() {
        |  var d = new Date();
        |  return d.getFullYear() + '-' + (d.getMonth() + 1) + '-' +
        |    d.getDate() + ' ' + d.getHours() + ':' + d.getMinutes();
        |}""".stripMargin, "f") == "2023-11-14 22:13")
    assert(runAt("function f() { return new Date().toISOString(); }", "f")
      == "2023-11-14T22:13:20.000Z")
    // string forms: ISO instant, local date-time with a space, bare date
    assert(run("function f(s) { return new Date(s).getTime(); }",
      "f", "2023-11-14T22:13:20Z") == fixed)
    assert(run("function f(s) { return new Date(s).getTime(); }",
      "f", "2023-11-14 22:13:20") == fixed)
    assert(run("function f(s) { return new Date(s).getFullYear(); }",
      "f", "2020-05-06") == 2020L)
    // epoch-millis constructor and date arithmetic via numeric coercion
    assert(run(
      s"""function f() {
         |  var a = new Date($fixed); var b = new Date(${fixed + 90_000});
         |  return (b - a) / 1000;
         |}""".stripMargin, "f") == 90L)
    assert(run(s"function f() { return new Date($fixed) < new Date(${fixed + 1}); }",
      "f") == true)
    // multi-arg constructor is UTC with 0-based month
    assert(run(
      "function f() { return new Date(2024, 0, 2, 3, 4, 5).toISOString(); }",
      "f") == "2024-01-02T03:04:05.000Z")
    // junk parses to Invalid Date: NaN fields, no exception
    def isNaN(v: Any) = v match {
      case d: Double => java.lang.Double.isNaN(d); case _ => false
    }
    assert(isNaN(run("function f(s) { return new Date(s).getTime(); }",
      "f", "not a date")))
    assert(run("function f(s) { return '' + new Date(s); }",
      "f", "not a date") == "Invalid Date")
  }

  test("new Error/RegExp/Array/Object; user prototypes stay rejected") {
    // thrown constructed errors carry the same name/message shape as
    // runtime errors, so catch blocks treat both alike
    assert(run(
      """function f() {
        |  try { throw new TypeError('bad type'); }
        |  catch (e) { return e.name + ': ' + e.message; }
        |}""".stripMargin, "f") == "TypeError: bad type")
    assert(run(
      """function f(s) { return new RegExp('^a+$', 'i').test(s); }""",
      "f", "AAa") == true)
    assert(run("function f() { return new Array(3).length; }", "f") == 3L)
    assert(run("function f() { return new Array(1, 2, 3).join('-'); }",
      "f") == "1-2-3")
    assert(run(
      """function f() { var o = new Object(); o.k = 1; return o.k; }""",
      "f") == 1L)
    // new on a script function is supported now — bare instances are
    // plain objects; an UNDEFINED constructor is the rejection
    assert(run(
      "function T() {} function f() { return JSON.stringify(new T()); }",
      "f") == "{}")
    val e = intercept[MiniJs.JsException](run(
      "function f() { return new Nope(); }", "f"))
    assert(e.getMessage.contains("'Nope' is not defined")) // the JS
    // ReferenceError shape; a bound non-constructor says "not a constructor"
    // the sandbox bounds a constructed-array bomb
    intercept[MiniJs.SandboxViolation](
      run("function f() { return new Array(2000000000).length; }", "f"))
  }

  test("switch: strict match, fallthrough, default, break scoping") {
    val sw =
      """function f(x) {
        |  var out = '';
        |  switch (x) {
        |    case 1: out += 'one '; // falls through
        |    case 2: out += 'two'; break;
        |    case ' 1': out += 'strone'; break;
        |    default: out += 'other';
        |  }
        |  return out;
        |}""".stripMargin
    assert(run(sw, "f", 1L) == "one two")
    assert(run(sw, "f", 2L) == "two")
    // strict equality: the string ' 1' must not match case 1
    assert(run(sw, "f", " 1") == "strone")
    assert(run(sw, "f", 99L) == "other")
    // break inside a switch exits the SWITCH, not the enclosing loop
    assert(run(
      """function f() {
        |  var n = 0;
        |  for (var i = 0; i < 3; i++) {
        |    switch (i) { case 0: case 1: n += 10; break; default: n += 1; }
        |  }
        |  return n;
        |}""".stripMargin, "f") == 21L)
  }

  test("do..while runs the body at least once and honors break/continue") {
    assert(run(
      """function f() { var n = 0; do { n += 1; } while (n < 5); return n; }""",
      "f") == 5L)
    assert(run(
      """function f() { var n = 0; do { n += 1; } while (false); return n; }""",
      "f") == 1L)
    assert(run(
      """function f() {
        |  var n = 0; var i = 0;
        |  do { i += 1; if (i % 2 == 0) { continue; } n += i;
        |  } while (i < 6);
        |  return n;
        |}""".stripMargin, "f") == 9L)
  }

  test("encodeURIComponent/decodeURIComponent follow the JS spec, " +
    "not URLEncoder") {
    // space is %20 (never +), unreserved !~*'() stay literal
    assert(run("function f(s) { return encodeURIComponent(s); }",
      "f", "a b!~*'()-_.") == "a%20b!~*'()-_.")
    assert(run("function f(s) { return encodeURIComponent(s); }",
      "f", "k=v&x/y") == "k%3Dv%26x%2Fy")
    // URI form keeps the reserved separators
    assert(run("function f(s) { return encodeURI(s); }",
      "f", "http://h/p?a=1&b=2 c") == "http://h/p?a=1&b=2%20c")
    // UTF-8 round-trip through multi-byte characters
    assert(run(
      "function f(s) { return decodeURIComponent(encodeURIComponent(s)); }",
      "f", "héllo wörld ☃") == "héllo wörld ☃")
    assert(run("function f(s) { return decodeURIComponent(s); }",
      "f", "caf%C3%A9+x") == "café+x")
    // malformed escapes throw the catchable URIError shape
    assert(run(
      """function f(s) {
        |  try { return decodeURIComponent(s); }
        |  catch (e) { return 'caught ' + e.message; }
        |}""".stripMargin, "f", "bad%2") == "caught URIError: URI malformed")
    assert(run("function f(v) { return Array.isArray(v); }",
      "f", Seq(1L, 2L)) == true)
    assert(run("function f() { return Array.isArray('nope'); }", "f") == false)
  }

  test("adversarial corners: braces in template strings, continue through " +
    "switch, break in do..while, template as call argument") {
    // a string literal containing '}' inside ${} must not close the hole
    assert(run("""function f() { return `a${'}'}b`; }""", "f") == "a}b")
    assert(run("""function f() { return `${ {k: '}'}.k }!`; }""", "f") == "}!")
    // continue inside a switch inside a loop targets the LOOP (only
    // break is switch-scoped)
    assert(run(
      """function f() {
        |  var n = 0;
        |  for (var i = 0; i < 4; i++) {
        |    switch (i % 2) { case 0: continue; }
        |    n += i;
        |  }
        |  return n;
        |}""".stripMargin, "f") == 4L)
    // break inside do..while exits after the first pass
    assert(run(
      """function f() { var n = 0; do { n += 1; break; } while (true); return n; }""",
      "f") == 1L)
    // a template literal as a function argument parses inside the call
    assert(run(
      """function g(s) { return s + '!'; }
        |function f(x) { return g(`v=${x * 2}`); }""".stripMargin,
      "f", 4L) == "v=8!")
    // nested arrows with templates
    assert(run(
      "function f() { return [1, 2].map(x => `n${x}`).join(','); }",
      "f") == "n1,n2")
  }

  test("review hardening: date rollover, zero-arg hosts, stringify of " +
    "dates, astral URI encoding, decodeURI reserved escapes") {
    // out-of-range fields ROLL OVER like JS (month 12 → January next
    // year; second 60 → next minute), never a raw DateTimeException
    assert(run(
      "function f() { return new Date(2023, 12, 1).toISOString(); }",
      "f") == "2024-01-01T00:00:00.000Z")
    assert(run(
      "function f() { return new Date(2023, 0, 1, 0, 0, 60).toISOString(); }",
      "f") == "2023-01-01T00:01:00.000Z")
    // absurd years are the Invalid Date, not a wrapped-Int wrong year
    def isNaN(v: Any) = v match {
      case d: Double => java.lang.Double.isNaN(d); case _ => false
    }
    assert(isNaN(run(
      "function f() { return new Date(99999999999, 0, 1).getTime(); }", "f")))
    // zero-arg host forms follow JS, never NoSuchElementException
    assert(isNaN(run("function f() { return Date.parse(); }", "f")))
    assert(run("function f(s) { return new RegExp().test(s); }",
      "f", "anything") == true)
    // JSON.stringify of a date is its ISO string; an Invalid Date
    // stringifies as null (toJSON semantics)
    assert(run(
      s"""function f() { return JSON.stringify({ts: new Date(1700000000000)}); }""",
      "f") == """{"ts":"2023-11-14T22:13:20.000Z"}""")
    assert(run(
      """function f() { return JSON.stringify({ts: new Date('junk')}); }""",
      "f") == """{"ts":null}""")
    assert(run("function f() { return new Date('junk').toJSON(); }",
      "f") == null)
    // astral characters (surrogate pairs) encode as real 4-byte UTF-8
    // escapes, not mangled '?'s, and round-trip
    assert(run("function f(s) { return encodeURIComponent(s); }",
      "f", "😀") == "%F0%9F%98%80")
    assert(run(
      "function f(s) { return decodeURIComponent(encodeURIComponent(s)); }",
      "f", "a😀b") == "a😀b")
    // decodeURI preserves reserved escapes (decoding %2F would change
    // a URL's path structure); decodeURIComponent decodes them
    assert(run("function f(s) { return decodeURI(s); }",
      "f", "http://h/p%23frag%2Fq%20x") == "http://h/p%23frag%2Fq x")
    assert(run("function f(s) { return decodeURIComponent(s); }",
      "f", "p%23frag%2Fq") == "p#frag/q")
    // an invalid UTF-8 escape sequence is the catchable URIError, not
    // a silent U+FFFD
    assert(run(
      """function f(s) {
        |  try { return decodeURIComponent(s); }
        |  catch (e) { return 'caught'; }
        |}""".stripMargin, "f", "%C3") == "caught")
  }

  test("missing mapper function fails like the reference") {
    val e = intercept[MiniJs.JsException](run("var x = 1;", "mapper"))
    assert(e.getMessage.contains("does not exist"))
  }

  test("parseInt/parseFloat return NaN on junk, never throw (JS semantics)") {
    def isNaN(v: Any) = v match {
      case d: Double => java.lang.Double.isNaN(d); case _ => false
    }
    assert(run("function f(s) { return parseInt(s); }", "f", "42abc") == 42L)
    assert(run("function f(s) { return parseInt(s); }", "f", "-7") == -7L)
    assert(isNaN(run("function f(s) { return parseInt(s); }", "f", "abc")))
    assert(isNaN(run("function f(s) { return parseInt(s); }", "f", "")))
    assert(run("function f(s) { return parseFloat(s); }", "f", "2.5x") == 2.5)
    assert(isNaN(run("function f(s) { return parseFloat(s); }", "f", "x")))
    // the in-language guard works on the results
    assert(run("function f(s) { return isNaN(parseInt(s)); }", "f", "nope") == true)
  }

  test("JsCustomMapper: a class-based Nashorn-style mapper runs over a DataFrame") {
    import spark.implicits._
    val df = Seq(("u1", 2.0), ("u2", 3.5)).toDF("_user", "amount")
    // the porting target: a mapper organized as a class with a helper
    // hierarchy, template literals, destructuring params, and arrows
    val mapper = JsCustomMapper(
      name = "classy",
      collection = "pageview",
      produced = Seq("label" -> FieldType.STRING, "scaled" -> FieldType.DOUBLE),
      params = Map("factor" -> "10"),
      code =
        """class Scaler {
          |  constructor(factor) { this.factor = factor; }
          |  scale(v) { return v * this.factor; }
          |}
          |class Labeler extends Scaler {
          |  constructor({factor = 1}) { super(factor); }
          |  label(user, v) { return `${user}:${this.scale(v)}`; }
          |}
          |function mapper(events, params, sourceIp, headers, sql, config) {
          |  var lab = new Labeler(params);
          |  var it = events.events();
          |  while (it.hasNext()) {
          |    var ev = it.next();
          |    ev.set('label', lab.label(ev.get('_user'), ev.get('amount')));
          |    ev.set('scaled', lab.scale(ev.get('amount')));
          |  }
          |}""".stripMargin)
    val rows = mapper(df).orderBy($"_user").collect()
    assert(rows.map(_.getAs[String]("label")).toSeq == Seq("u1:20", "u2:35"))
    assert(rows.map(_.getAs[Double]("scaled")).toSeq == Seq(20.0, 35.0))
  }

  test("JsCustomMapper: events proxy get/set/setOnce/drop over a DataFrame") {
    import spark.implicits._
    val df = Seq(
      ("u1", "view", 10.0), ("u2", "click", 5.0), ("spam", "view", 0.0))
      .toDF("_user", "event_type", "amount")
    val mapper = JsCustomMapper(
      name = "cents",
      collection = "pageview",
      produced = Seq("amount_cents" -> FieldType.DOUBLE, "source" -> FieldType.STRING),
      params = Map("origin" -> "web"),
      code =
        """function mapper(events, params, sourceIp, headers, sql, config) {
          |  var it = events.events();
          |  while (it.hasNext()) {
          |    var ev = it.next();
          |    if (ev.collection() === 'pageview') {
          |      if (ev.get('_user') === 'spam') { ev.drop(); continue; }
          |      ev.set('amount_cents', ev.get('amount') * 100);
          |      ev.setOnce('source', params.origin);
          |      ev.setOnce('source', 'should-not-win');
          |    }
          |  }
          |  return {sid: 'abc'};
          |}""".stripMargin)
    val out = mapper(df).orderBy($"_user")
    assert(out.count() == 2) // spam row dropped
    val rows = out.collect()
    assert(rows.map(_.getAs[Double]("amount_cents")).toSeq == Seq(1000.0, 500.0))
    assert(rows.map(_.getAs[String]("source")).toSeq == Seq("web", "web"))
    // pipeline composition with built-in mappers still works
    val chained = MapperPipeline.run(df, Seq(mapper))
    assert(chained.columns.contains("amount_cents"))
  }

  test("JsCustomMapper coerces script values to the DECLARED column types") {
    import spark.implicits._
    // In MiniJs every integer literal is a Long and float math a Double;
    // without schema-aware normalization a Long lands in the DOUBLE
    // column's Row slot and Catalyst's converter kills the job.
    val df = Seq(("u1", 7L), ("u2", 10L)).toDF("_user", "n")
    val mapper = JsCustomMapper(
      name = "typed",
      collection = "c",
      produced = Seq(
        "score" -> FieldType.DOUBLE,   // script writes an integer literal
        "half" -> FieldType.LONG,      // script writes float math (whole)
        "frac" -> FieldType.LONG,      // script writes a NON-whole double
        "label" -> FieldType.STRING,   // script writes a number
        "flag" -> FieldType.BOOLEAN),
      params = Map.empty,
      code =
        """function mapper(events, params, sourceIp, headers, sql, config) {
          |  var it = events.events();
          |  while (it.hasNext()) {
          |    var ev = it.next();
          |    ev.set('score', 100);
          |    ev.set('half', ev.get('n') * 0.5 * 2);
          |    ev.set('frac', 2.5);
          |    ev.set('label', 42);
          |    ev.set('flag', true);
          |  }
          |}""".stripMargin)
    val rows = mapper(df).orderBy($"_user").collect()
    assert(rows.map(_.getAs[Double]("score")).toSeq == Seq(100.0, 100.0))
    assert(rows.map(_.getAs[Long]("half")).toSeq == Seq(7L, 10L))
    // non-whole double into LONG cannot be represented → null (dead-letter
    // spirit), not a job-killing ClassCastException
    assert(rows.forall(_.isNullAt(rows.head.fieldIndex("frac"))))
    assert(rows.map(_.getAs[String]("label")).toSeq == Seq("42", "42"))
    assert(rows.map(_.getAs[Boolean]("flag")).toSeq == Seq(true, true))
  }

  test("JsWebhookTransform: one body to 0..n event lines") {
    val bodies = spark.sparkContext.parallelize(Seq(
      """{"user": "u1", "items": [{"sku": "a"}, {"sku": "b"}]}""",
      """{"user": "u2", "items": []}"""))
    val out = JsWebhookTransform(
      """function module(params, body, headers) {
        |  var events = [];
        |  for (var i = 0; i < body.items.length; i++) {
        |    events.push({collection: 'purchase',
        |      properties: {_user: body.user, sku: body.items[i].sku}});
        |  }
        |  return events;
        |}""".stripMargin)(bodies).collect().sorted
    assert(out.length == 2)
    assert(out.forall(_.contains("\"collection\":\"purchase\"")))
    assert(out.head.contains("\"sku\":\"a\""))
    // and the produced lines are valid JsonIngest input
    val registry = graft.core.SchemaRegistry.inMemory()
    val res = graft.ingest.JsonIngest.ingest(spark, registry, "demo",
      spark.sparkContext.parallelize(out.toSeq))
    assert(res.byCollection("purchase").count() == 2)
    res.unpersist()
  }

  test("syntax errors are rejected at registration time") {
    intercept[MiniJs.JsException] {
      JsCustomMapper("bad", "c", Seq.empty, Map.empty,
        "function mapper(events { return; }")
    }
  }

  // ---- this / prototypes / classes (the Nashorn-mapper constructs the
  // round-7 verdict listed as the remaining gap) ----

  test("this binds on method calls, stays undefined on plain calls") {
    assert(run(
      """var o = {x: 41, m: function() { return this.x + 1; }};
        |function f() { return o.m(); }""".stripMargin, "f") == 42L)
    assert(run(
      """var o = {x: 1, m: function() { return this; }};
        |function f() { var g = o.m; return typeof g(); }""".stripMargin,
      "f") == "undefined")
    // index-call binds this exactly like member-call
    assert(run(
      """var o = {x: 7, m: function() { return this.x; }};
        |function f() { return o['m'](); }""".stripMargin, "f") == 7L)
  }

  test("arrow functions capture lexical this; functions do not") {
    assert(run(
      """var o = {x: 10, m: function() {
        |  var inc = () => this.x + 1;
        |  return inc();
        |}};
        |function f() { return o.m(); }""".stripMargin, "f") == 11L)
    assert(run(
      """var o = {x: 10, m: function() {
        |  var inc = function() { return typeof this; };
        |  return inc();
        |}};
        |function f() { return o.m(); }""".stripMargin, "f") == "undefined")
  }

  test("new on a script function builds on its prototype") {
    val code =
      """function Point(x, y) { this.x = x; this.y = y; }
        |Point.prototype.norm1 = function() {
        |  return Math.abs(this.x) + Math.abs(this.y);
        |};
        |function f() {
        |  var p = new Point(3, -4);
        |  return p.norm1() + ':' + (p instanceof Point) +
        |    ':' + JSON.stringify(p);
        |}""".stripMargin
    // JSON/enumeration see OWN properties only — methods stay off the
    // wire exactly like non-enumerable JS class methods
    assert(run(code, "f") == "7:true:{\"x\":3,\"y\":-4}")
  }

  test("constructor object return overrides the instance; primitives do not") {
    assert(run(
      """function A() { this.k = 1; return {k: 99}; }
        |function B() { this.k = 1; return 42; }
        |function f() { return new A().k + ':' + new B().k; }""".stripMargin,
      "f") == "99:1")
  }

  test("class declaration: constructor, methods, statics, instanceof") {
    val code =
      """class Counter {
        |  constructor(start) { this.n = start; }
        |  bump(by) { this.n += by; return this.n; }
        |  static origin() { return new Counter(0); }
        |}
        |function f() {
        |  var c = Counter.origin();
        |  c.bump(2); c.bump(3);
        |  return c.n + ':' + (c instanceof Counter);
        |}""".stripMargin
    assert(run(code, "f") == "5:true")
  }

  test("class extends: super constructor, super method, chain instanceof") {
    val code =
      """class Base {
        |  constructor(tag) { this.tag = tag; }
        |  describe() { return 'base:' + this.tag; }
        |}
        |class Derived extends Base {
        |  constructor(tag, extra) { super(tag); this.extra = extra; }
        |  describe() { return super.describe() + '+' + this.extra; }
        |}
        |function f() {
        |  var d = new Derived('t', 'e');
        |  return d.describe() + ':' + (d instanceof Base) +
        |    ':' + (d instanceof Derived);
        |}""".stripMargin
    assert(run(code, "f") == "base:t+e:true:true")
  }

  test("ctor-less derived class forwards constructor arguments") {
    assert(run(
      """class A { constructor(x, y) { this.sum = x + y; } }
        |class B extends A { label() { return 'B' + this.sum; } }
        |function f() { return new B(20, 22).label(); }""".stripMargin,
      "f") == "B42")
  }

  test("inherited methods resolve through the chain; writes shadow own") {
    assert(run(
      """class A { hello() { return 'A'; } }
        |class B extends A { }
        |function f() {
        |  var b = new B();
        |  var viaChain = b.hello();
        |  b.hello = function() { return 'own'; };
        |  return viaChain + ':' + b.hello() + ':' + new B().hello();
        |}""".stripMargin, "f") == "A:own:A")
  }

  test("call / apply / bind") {
    assert(run(
      """function who() { return this.name; }
        |function f() {
        |  var a = who.call({name: 'c'});
        |  var b = who.apply({name: 'ap'}, []);
        |  var g = who.bind({name: 'bo'});
        |  function add(x, y) { return x + y; }
        |  var add5 = add.bind(undefined, 5);
        |  return a + ':' + b + ':' + g() + ':' + add5(37);
        |}""".stripMargin, "f") == "c:ap:bo:42")
  }

  test("in operator: own, inherited, array index; hasOwnProperty is own-only") {
    assert(run(
      """class A { m() { return 1; } }
        |function f() {
        |  var a = new A();
        |  a.own = 1;
        |  var arr = [10, 20];
        |  return ('own' in a) + ':' + ('m' in a) + ':' +
        |    a.hasOwnProperty('own') + ':' + a.hasOwnProperty('m') + ':' +
        |    (1 in arr) + ':' + (2 in arr);
        |}""".stripMargin, "f") == "true:true:true:false:true:false")
  }

  test("Object.create and getPrototypeOf") {
    assert(run(
      """function f() {
        |  var proto = {greet: function() { return 'hi ' + this.name; }};
        |  var o = Object.create(proto);
        |  o.name = 'x';
        |  return o.greet() + ':' +
        |    (Object.getPrototypeOf(o) === proto) + ':' +
        |    JSON.stringify(Object.keys(o));
        |}""".stripMargin, "f") == "hi x:true:[\"name\"]")
  }

  test("parameter defaults and destructuring parameters") {
    assert(run(
      """function f(a, b = a + 1) { return a * 10 + b; }""", "f", 3L) == 34L)
    assert(run(
      """function pick({id, name = 'anon'}, [first = 0]) {
        |  return id + ':' + name + ':' + first;
        |}
        |function f() { return pick({id: 7}, []); }""".stripMargin,
      "f") == "7:anon:0")
    assert(run(
      """var g = ({a, b} = {a: 1, b: 2}) => a + b;
        |function f() { return g() + g({a: 10, b: 20}); }""".stripMargin,
      "f") == 33L)
  }

  test("object literal property and method shorthand") {
    assert(run(
      """function f() {
        |  var a = 1, b = 2;
        |  var o = {a, b, sum(extra) { return this.a + this.b + extra; }};
        |  return o.sum(39);
        |}""".stripMargin, "f") == 42L)
  }

  test("for..in over a class instance enumerates own properties only") {
    assert(run(
      """class A { constructor() { this.x = 1; this.y = 2; } m() {} }
        |function f() {
        |  var keys = [];
        |  for (var k in new A()) { keys.push(k); }
        |  return keys.join(',');
        |}""".stripMargin, "f") == "x,y")
  }

  test("reserved words and super misuse are parse errors") {
    intercept[MiniJs.JsException](run("function f() { var this = 1; }", "f"))
    intercept[MiniJs.JsException](run("function f(super) { return 1; }", "f"))
    intercept[MiniJs.JsException](
      run("function f() { super.m(); }", "f"))
    // new on an arrow is a runtime TypeError-shape, not a crash
    intercept[MiniJs.JsException](
      run("var g = () => 1; function f() { return new g(); }", "f"))
  }

  test("constructors honor the step budget like any other code") {
    intercept[MiniJs.SandboxViolation](
      JsCodeCompiler.createEngine(
        """function Hog() { while (true) { this.x = 1; } }
          |function f() { return new Hog(); }""".stripMargin,
        maxSteps = 10000).invoke("f"))
  }

  test("shadowing a built-in constructor name prefers the script binding") {
    assert(run(
      """var Date = function(ms) { this.ms = ms; };
        |Date.prototype.tag = function() { return 'script:' + this.ms; };
        |function f() { return new Date(5).tag(); }""".stripMargin,
      "f") == "script:5")
  }

  test("static super resolves to parent statics; super() is illegal there") {
    assert(run(
      """class A { static tag() { return 'A' + this.suffix(); }
        |  static suffix() { return '!'; } }
        |class B extends A {
        |  static suffix() { return '?'; }
        |  static tag() { return 'B>' + super.tag(); }
        |}
        |function f() { return B.tag(); }""".stripMargin, "f") == "B>A?")
    intercept[MiniJs.JsException](run(
      """class A {}
        |class B extends A { static bad() { super(); } }
        |function f() { return 1; }""".stripMargin, "f"))
  }

  test("new on a non-function shadowing value is a TypeError, not a fallback") {
    val e = intercept[MiniJs.JsException](run(
      "var RegExp = 5; function f() { return new RegExp('x'); }", "f"))
    assert(e.getMessage.contains("not a constructor"))
    // a constructor returning a Date overrides the instance (object rule)
    assert(run(
      """function C() { return new Date(86400000); }
        |function f() { return new C().getTime(); }""".stripMargin,
      "f") == 86400000L)
  }

  test("instanceof works against the built-in constructor names") {
    assert(run(
      """function f() {
        |  var e;
        |  try { null.x; } catch (err) { e = err; }
        |  return ([1] instanceof Array) + ':' + ({} instanceof Array) + ':' +
        |    (new Date(0) instanceof Date) + ':' + (/x/ instanceof RegExp) + ':' +
        |    (e instanceof Error) + ':' +
        |    (new TypeError('t') instanceof Error) + ':' +
        |    (new TypeError('t') instanceof RangeError) + ':' +
        |    ([] instanceof Object) + ':' + ('s' instanceof Object);
        |}""".stripMargin,
      "f") == "true:false:true:true:true:true:false:true:false")
  }

  test("in on arrays: only genuine indexes (or length), never NaN→0") {
    assert(run(
      """function f() {
        |  var a = [10, 20];
        |  return ('foo' in a) + ':' + ('0' in a) + ':' + (1.5 in a) +
        |    ':' + ('length' in a) + ':' + (0 in []);
        |}""".stripMargin, "f") == "false:true:false:true:false")
  }

  test("a parent static named call cannot hijack super()") {
    assert(run(
      """class A {
        |  static call() { return 'hijacked'; }
        |  constructor() { this.k = 1; }
        |}
        |class B extends A { constructor() { super(); } }
        |function f() { return new B().k; }""".stripMargin, "f") == 1L)
  }

  test("super works inside a template-literal hole") {
    assert(run(
      """class A { describe() { return 'a'; } }
        |class B extends A {
        |  describe() { return `x:${super.describe()}`; }
        |}
        |function f() { return new B().describe(); }""".stripMargin,
      "f") == "x:a")
  }

  test("new resolves the constructor before evaluating arguments") {
    assert(run(
      """var n = 0;
        |function g() { n = 1; return 0; }
        |function f() {
        |  try { new Missing(g()); } catch (e) {}
        |  return n;
        |}""".stripMargin, "f") == 0L)
  }

  test("for..in yields inherited data properties but not inherited methods") {
    assert(run(
      """function f() {
        |  var proto = {shared: 1, helper: function() {}};
        |  var o = Object.create(proto);
        |  o.own = 2;
        |  var ks = [];
        |  for (var k in o) { ks.push(k); }
        |  return ks.sort().join(',');
        |}""".stripMargin, "f") == "own,shared")
  }

  test("bind chains stay metered by the step budget") {
    intercept[MiniJs.SandboxViolation](
      JsCodeCompiler.createEngine(
        """function g() { return 1; }
          |function f() {
          |  var b = g;
          |  for (var i = 0; i < 2000; i++) { b = b.bind(null, 1); }
          |  return b();
          |}""".stripMargin, maxSteps = 100000).invoke("f"))
    // a shallow bind chain is fine and sees the innermost this
    assert(run(
      """function who() { return this.tag; }
        |function f() {
        |  var b = who.bind({tag: 'inner'}).bind({tag: 'outer'});
        |  return b();
        |}""".stripMargin, "f") == "inner")
  }

  test("deep Object.create chains stay metered on miss lookups") {
    intercept[MiniJs.SandboxViolation](
      JsCodeCompiler.createEngine(
        """function f() {
          |  var p = {};
          |  for (var i = 0; i < 5000; i++) { p = Object.create(p); }
          |  var sink = 0;
          |  for (var j = 0; j < 5000; j++) {
          |    if (p.nope === undefined) { sink++; }
          |  }
          |  return sink;
          |}""".stripMargin, maxSteps = 200000).invoke("f"))
  }

  test("reserved words are rejected in catch and loop bindings too") {
    intercept[MiniJs.JsException](
      run("function f() { try { } catch (this) { } }", "f"))
    intercept[MiniJs.JsException](
      run("function f() { for (this in {a: 1}) { } }", "f"))
  }

  test("JSON.stringify omits functions/undefined in objects, nulls them in arrays") {
    assert(run(
      """function f() {
        |  var o = {a: 1, fn: function() {}, u: undefined, re: /x/g};
        |  return JSON.stringify(o) + ':' +
        |    JSON.stringify([1, function() {}, undefined]) + ':' +
        |    typeof JSON.stringify(function() {});
        |}""".stripMargin, "f") == "{\"a\":1,\"re\":{}}:[1,null,null]:undefined")
    // an instance whose ctor stores a function as an OWN property must
    // stringify (omitting it), not crash in the serializer
    assert(run(
      """function W() { this.v = 2; this.fn = function() {}; }
        |function f() { return JSON.stringify(new W()); }""".stripMargin,
      "f") == "{\"v\":2}")
  }

  test("Math constants/trig, String.fromCharCode, Number statics, substr") {
    // the geo-distance idiom: PI + trig + atan2
    val d = run(
      """function rad(x) { return x * Math.PI / 180; }
        |function f() {
        |  var lat1 = rad(40.7), lat2 = rad(51.5);
        |  var dLon = rad(-0.1 - -74.0);
        |  var y = Math.sin(dLon) * Math.cos(lat2);
        |  var x = Math.cos(lat1) * Math.sin(lat2) -
        |    Math.sin(lat1) * Math.cos(lat2) * Math.cos(dLon);
        |  return Math.round(Math.atan2(y, x) * 1000);
        |}""".stripMargin, "f")
    assert(d == 894L) // initial bearing NYC→London, milliradians
    assert(run("function f() { return String.fromCharCode(72, 105); }", "f") == "Hi")
    assert(run("function f(s) { return s.substr(2, 3) + ':' + s.substr(-3); }",
      "f", "abcdefgh") == "cde:fgh")
    assert(run(
      """function f() {
        |  return Number.isInteger(5) + ':' + Number.isInteger(5.5) +
        |    ':' + Number.isNaN('x') + ':' + Number.isNaN(0 / 0) +
        |    ':' + (Number.MAX_SAFE_INTEGER === 9007199254740991);
        |}""".stripMargin, "f") == "true:false:false:true:true")
    assert(run("function f() { return Math.round(Math.log2(1024)); }", "f") == 10L)
    // an unknown host property still fails loudly, not as undefined
    intercept[MiniJs.JsException](
      run("function f() { return Math.TAU; }", "f"))
  }

  test("Date setters: truncate-to-day, date arithmetic, overflow, invalid") {
    // the truncate-to-midnight idiom
    assert(run(
      """function f(ts) {
        |  var d = new Date(ts);
        |  d.setHours(0, 0, 0, 0);
        |  return d.getTime();
        |}""".stripMargin, "f", 1723645000123L) == 1723593600000L)
    // seven-days-ago via setDate with underflow into the prior month
    assert(run(
      """function f() {
        |  var d = new Date('2024-03-03T12:00:00Z');
        |  d.setDate(d.getDate() - 7);
        |  return d.toISOString();
        |}""".stripMargin, "f") == "2024-02-25T12:00:00.000Z")
    // setDate(0) = last day of previous month; setMonth(12) rolls year
    assert(run(
      """function f() {
        |  var d = new Date('2024-03-15T00:00:00Z');
        |  d.setDate(0);
        |  var e = new Date('2024-05-01T00:00:00Z');
        |  e.setMonth(12);
        |  return d.getDate() + ':' + e.getFullYear() + ':' + e.getMonth();
        |}""".stripMargin, "f") == "29:2025:0")
    // setters return the new timestamp; new Date(d) clones (no aliasing)
    assert(run(
      """function f() {
        |  var d = new Date(1000);
        |  var copy = new Date(d);
        |  var r = d.setSeconds(5);
        |  return r + ':' + copy.getTime();
        |}""".stripMargin, "f") == "5000:1000")
    // a NaN argument invalidates; setTime revives
    assert(run(
      """function f() {
        |  var d = new Date(0);
        |  var nan = d.setHours(0 / 0);
        |  var after = d.getTime();
        |  d.setTime(42);
        |  return isNaN(nan) + ':' + isNaN(after) + ':' + d.getTime();
        |}""".stripMargin, "f") == "true:true:42")
  }

  test("host-surface spec corners: variadic hypot, exact log2, zero-arg casts") {
    assert(run("function f() { return Math.hypot(1, 2, 2); }", "f") == 3.0)
    assert(run("function f(x) { return isNaN(Math.hypot(x) - 3) === false; }",
      "f", 3L) == true)
    // one-arg atan2/pow are NaN like JS, never an index crash
    assert(run("function f() { return isNaN(Math.atan2(1)) && isNaN(Math.pow(2)); }",
      "f") == true)
    // exact powers of two: ceil(log2(2^29)) must be 29, not 30
    assert(run("function f() { return Math.ceil(Math.log2(536870912)); }",
      "f") == 29L)
    assert(run("function f() { return String() + ':' + Number(); }", "f") == ":0")
    // substr with an undefined length takes the rest of the string;
    // a null length coerces to 0 (empty) like any numeric context
    assert(run("function f(s) { var o = {}; return s.substr(2, o.missing); }",
      "f", "abcdefgh") == "cdefgh")
    assert(run("function f(s, l) { return s.substr(2, l); }", "f",
      "abcdefgh", null) == "")
  }

  test("setFullYear builds a date from an Invalid Date (t = +0 substitution)") {
    assert(run(
      """function f() {
        |  var d = new Date(0 / 0);
        |  d.setFullYear(2020, 5, 15);
        |  return d.toISOString();
        |}""".stripMargin, "f") == "2020-06-15T00:00:00.000Z")
  }

  test("instances cross the host boundary as own-property maps") {
    val eng = JsCodeCompiler.createEngine(
      """class Row { constructor(k, v) { this.key = k; this.value = v; }
        |  hidden() { return 1; } }
        |function f(k) { return new Row(k, k + '!'); }""".stripMargin)
    val out = eng.fromJs(eng.invoke("f", "a"))
    assert(out == Map("key" -> "a", "value" -> "a!"))
  }

  test("bare destructuring assignment: object, array, nested, defaults") {
    // object form (parenthesized, as JS requires at statement level)
    assert(run(
      """function f(o) { var a = 0, c = 0; ({a, b: c} = o); return a * 10 + c; }""",
      "f", Map("a" -> 3L, "b" -> 4L)) == 34L)
    // array form needs no parens at statement level
    assert(run(
      """function f() { var x = 1, y = 2; [x, y] = [y, x]; return x * 10 + y; }""",
      "f") == 21L)
    // nested patterns, both kinds at once
    assert(run(
      """function f(o) { var b = 0, d = 0; ({a: {b}, c: [d]} = o); return b + d; }""",
      "f", Map("a" -> Map("b" -> 30L), "c" -> Seq(12L))) == 42L)
    // defaults fire only on undefined — 0 is kept (the declaration rule)
    assert(run(
      """function f() { var x = 1, y = 1, z = 1; [x = 9, y = 9, z = 9] = [0, 7]; return '' + x + y + z; }""",
      "f") == "079")
    // `{a: v = 5}` default-with-rename on a missing property
    assert(run(
      """function f(o) { var v = 0; ({a: v = 5} = o); return v; }""",
      "f", Map("b" -> 1L)) == 5L)
    // member and index targets
    assert(run(
      """function f() { var o = {}, arr = [0, 0]; [o.a, arr[1]] = [7, 8]; return o.a * 10 + arr[1]; }""",
      "f") == 78L)
    // the assignment expression's value is the rhs
    assert(run(
      """function f() { var x = 0; var r = ([x] = [5, 6]); return x * 100 + r[1]; }""",
      "f") == 506L)
    // rhs evaluated exactly once
    assert(run(
      """var n = 0;
        |function mk() { n += 1; return [1, 2]; }
        |function f() { var a = 0, b = 0; [a, b] = mk(); return n * 100 + a * 10 + b; }""".stripMargin,
      "f") == 112L)
    // `this.x` is a valid pattern target — the desugar's arrow keeps
    // `this` lexical, the JS rule
    assert(run(
      """class C {
        |  constructor() { this.a = 0; }
        |  set(o) { ({a: this.a} = o); return this.a; }
        |}
        |function f(o) { return new C().set(o); }""".stripMargin,
      "f", Map("a" -> 9L)) == 9L)
  }

  test("bare destructuring assignment: parse-time rejections") {
    // compound ops on a pattern are illegal, as in JS
    val e1 = intercept[MiniJs.JsException](MiniJs.parse("[x, y] += a;"))
    assert(e1.getMessage.contains("invalid assignment target"))
    // non-target leaves reject at PARSE time, never per-row at runtime
    val e2 = intercept[MiniJs.JsException](MiniJs.parse("[f()] = a;"))
    assert(e2.getMessage.contains("destructuring"))
    val e3 = intercept[MiniJs.JsException](MiniJs.parse("({m(){ return 1; }} = o);"))
    assert(e3.getMessage.contains("destructuring"))
    // object SHORTHAND defaults are out of scope — also a parse error
    val e4 = intercept[MiniJs.JsException](MiniJs.parse("({a = 1} = o);"))
    assert(e4.getMessage.contains("expected"))
  }

  test("arguments: length, indexing, shadowing, arrow fall-through") {
    assert(run("function f() { return arguments.length; }", "f", 1L, 2L, 3L) == 3L)
    assert(run("function f() { return arguments[1]; }", "f", 10L, 20L) == 20L)
    // extra actuals beyond the declared params are still visible
    assert(run("function f(a) { return a + arguments[1]; }", "f", 1L, 2L) == 3L)
    // arguments.length counts ACTUALS, not declared params
    assert(run("function f(a, b, c) { return arguments.length; }", "f", 1L) == 1L)
    // a parameter named arguments shadows the implicit binding
    assert(run("function f(arguments) { return arguments; }", "f", 7L) == 7L)
    // arrows don't bind arguments — lexical fall-through to the
    // enclosing function, regardless of the arrow's own actuals
    assert(run(
      """function f(a, b) {
        |  var g = (q) => arguments.length;
        |  return g(9);
        |}""".stripMargin, "f", 1L, 2L, 3L) == 3L)
  }

  test("string escapes: code points, NUL, ASCII-only hex, octal rejection") {
    // ES2015 \u{...} code-point escapes, incl. astral (surrogate pair)
    assert(run("function f() { return '\\u{48}' + '\\u{1F600}'.length; }",
      "f") == "H2")
    // strict-mode JS: lone \0 is NUL, not the character '0'
    assert(run("function f() { return '\\0' === '\\u0000'; }", "f") == true)
    assert(run("function f() { return '\\0'.length; }", "f") == 1L)
    // legacy octal escapes are a loud parse error, as in strict JS
    val e1 = intercept[MiniJs.JsException](MiniJs.parse("var s = '\\07';"))
    assert(e1.getMessage.contains("octal"))
    val e2 = intercept[MiniJs.JsException](MiniJs.parse("var s = '\\3';"))
    assert(e2.getMessage.contains("octal"))
    // malformed \u{} forms
    val e3 = intercept[MiniJs.JsException](MiniJs.parse("var s = '\\u{}';"))
    assert(e3.getMessage.contains("hex digits"))
    val e4 = intercept[MiniJs.JsException](MiniJs.parse("var s = '\\u{110000}';"))
    assert(e4.getMessage.contains("out of range"))
    // non-ASCII "hex digits" (fullwidth Ｆ) reject — Character.digit
    // would have accepted them; real JS does not
    val e5 = intercept[MiniJs.JsException](MiniJs.parse("var s = '\\uＦＦ41';"))
    assert(e5.getMessage.contains("4 hex digits"))
    // raw U+0000 in template source corrupts the NUL-separated token
    // encoding — rejected with the same error as the escaped form
    val nul = 0.toChar.toString
    val e6 = intercept[MiniJs.JsException](MiniJs.parse("var t = `a" + nul + "b`;"))
    assert(e6.getMessage.contains("raw NUL"))
    val e7 = intercept[MiniJs.JsException](MiniJs.parse("var t = `a${ '" + nul + "' }b`;"))
    assert(e7.getMessage.contains("raw NUL"))
    val e8 = intercept[MiniJs.JsException](MiniJs.parse("var r = /a" + nul + "b/;"))
    assert(e8.getMessage.contains("raw NUL"))
  }

  test("class fields: instance, derived ordering, static, bare") {
    assert(run(
      """class Counter {
        |  count = 10;
        |  label;
        |  bump(n) { this.count += n; return this.count; }
        |}
        |function f() { var c = new Counter(); return c.bump(5) + '' + c.label; }""".stripMargin,
      "f") == "15undefined")
    // derived fields initialize AFTER super() — they can read what the
    // parent constructor (and parent fields) set up
    assert(run(
      """class A { constructor() { this.base = 7; } }
        |class B extends A { total = this.base + 30; }
        |function f() { return new B().total; }""".stripMargin, "f") == 37L)
    // field initializers with an explicit derived ctor run right after
    // the super(...) statement
    assert(run(
      """class A { constructor(v) { this.v = v; } }
        |class B extends A {
        |  doubled = this.v * 2;
        |  constructor(v) { super(v); this.after = this.doubled + 1; }
        |}
        |function f() { var b = new B(21); return b.doubled * 100 + b.after; }""".stripMargin,
      "f") == 4243L)
    // static fields evaluate at class-definition time
    assert(run(
      """class Config { static LIMIT = 6 * 7; static NAME = 'graft'; }
        |function f() { return Config.NAME + Config.LIMIT; }""".stripMargin,
      "f") == "graft42")
    // fields are OWN enumerable data properties: JSON and hasOwnProperty
    assert(run(
      """class P { x = 1; y = 2; m() { return 0; } }
        |function f() { return JSON.stringify(new P()); }""".stripMargin,
      "f") == """{"x":1,"y":2}""")
    // a super(...) NESTED in a conditional/expression can't anchor field
    // insertion — real JS runs fields right after whichever super()
    // executes; silently running them FIRST would invert parent/child
    // init order, so the form is rejected loudly at parse time
    val e = intercept[MiniJs.JsException](run(
      """class A { constructor(v) { this.v = v; } }
        |class B extends A {
        |  doubled = this.v * 2;
        |  constructor(v) { if (v > 0) { super(v); } else { super(0); } }
        |}
        |function f() { return new B(1).doubled; }""".stripMargin, "f"))
    assert(e.getMessage.contains("top-level constructor statement"))
    // ...but only when fields are present: the same nested-super ctor
    // without fields keeps working
    assert(run(
      """class A { constructor(v) { this.v = v; } }
        |class B extends A {
        |  constructor(v) { if (v > 0) { super(v); } else { super(0); } }
        |}
        |function f() { return new B(-5).v; }""".stripMargin, "f") == 0L)
  }

  test("object-literal getters/setters: deref, intercept, merge, JSON") {
    // get/set pair on one name is ONE accessor property; `this` is the
    // literal itself (Nashorn-era mapper scripts lean on this form)
    assert(run(
      """function f() {
        |  var o = {
        |    c: 0,
        |    get fahrenheit() { return this.c * 9 / 5 + 32; },
        |    set fahrenheit(v) { this.c = (v - 32) * 5 / 9; }
        |  };
        |  var before = o.fahrenheit;
        |  o.fahrenheit = 212;
        |  return before + ':' + o.c;
        |}""".stripMargin, "f") == "32:100")
    // getter-only reads; writing it throws (strict rule, like classes)
    assert(run(
      """function f() {
        |  var o = { get id() { return 7; } };
        |  try { o.id = 9; return 'wrote'; }
        |  catch (e) { return o.id + ':' + (e instanceof TypeError ? 'TE' : e.message); }
        |}""".stripMargin, "f").toString.startsWith("7:"))
    // setter-only: read is undefined, write intercepts
    assert(run(
      """function f() {
        |  var log = [];
        |  var o = { set tap(v) { log.push(v); } };
        |  o.tap = 1; o.tap = 2;
        |  return (o.tap === undefined) + ':' + log.join(',');
        |}""".stripMargin, "f") == "true:1,2")
    // methods/fields NAMED get/set still parse (contextual keyword)
    assert(run(
      """function f() {
        |  var o = { get: 1, set: 2, geta: 3 };
        |  var p = { get(k) { return k + 10; } };
        |  return o.get + o.set + o.geta + p.get(4);
        |}""".stripMargin, "f") == 20L)
    // JSON.stringify serializes own accessors through the getter —
    // real-JS semantics (class accessors live on the prototype and
    // stay invisible to stringify, as before)
    assert(run(
      """function f() {
        |  var o = { a: 1, get b() { return this.a + 1; } };
        |  return JSON.stringify(o);
        |}""".stripMargin, "f") == """{"a":1,"b":2}""")
    // accessors are own enumerable properties: for-in sees them
    assert(run(
      """function f() {
        |  var o = { x: 1, get y() { return 2; } };
        |  var ks = []; for (var k in o) ks.push(k);
        |  return ks.join(',');
        |}""".stripMargin, "f") == "x,y")
    // a later data property replaces the accessor (last-wins)
    assert(run(
      """function f() {
        |  var o = { get v() { return 1; }, v: 42 };
        |  o.v = 5; return o.v;
        |}""".stripMargin, "f") == 5L)
    // Object.values/entries/assign read THROUGH the getter — the raw
    // internal accessor slot must never leak to scripts
    assert(run(
      """function f() {
        |  var o = { a: 1, get b() { return this.a + 1; } };
        |  var copy = Object.assign({}, o);
        |  copy.a = 100; // a VALUE was copied, not a live accessor
        |  return Object.values(o).join(',') + '|' +
        |    Object.entries(o).map(e => e[0] + '=' + e[1]).join(',') + '|' +
        |    copy.b;
        |}""".stripMargin, "f") == "1,2|a=1,b=2|2")
  }

  test("new on a bound function constructs the target, bound this ignored") {
    assert(run(
      """function P(a, b) { this.sum = a + b; }
        |P.prototype.get = function() { return this.sum; };
        |function f() {
        |  var B = P.bind({decoy: 1}, 40);
        |  var p = new B(2);
        |  return p.get() + ':' + (p instanceof P) + ':' + (p.decoy === undefined);
        |}""".stripMargin, "f") == "42:true:true")
    // chained binds prepend in bind order; instanceof resolves through
    // the FULL chain (OrdinaryHasInstance recurses to the target)
    assert(run(
      """function T(a, b, c) { this.v = '' + a + b + c; }
        |function f() {
        |  var B = T.bind(null, 1).bind(null, 2);
        |  var t = new B(3);
        |  return t.v + ':' + (t instanceof B) + ':' + (t instanceof T);
        |}""".stripMargin, "f") == "123:true:true")
  }

  test("class expressions: anonymous, named self-reference, extends, inline new") {
    assert(run(
      """var C = class { constructor(x) { this.x = x; } dbl() { return this.x * 2; } };
        |function f() { return new C(21).dbl(); }""".stripMargin, "f") == 42L)
    // a NAME binds only inside the body (self-reference), not outside
    assert(run(
      """var C = class Named { tag() { return typeof Named; } };
        |function f() { return new C().tag() + ':' + (typeof Named); }""".stripMargin,
      "f") == "function:undefined")
    // extends an expression-position superclass; inline `new (class …)`
    assert(run(
      """function mixin(Base) {
        |  return class extends Base { m() { return super.m() + '!'; } };
        |}
        |class A { m() { return 'a'; } }
        |function f() {
        |  var M = mixin(A);
        |  return new M().m() + ':' + new (class { v() { return 7; } })().v();
        |}""".stripMargin, "f") == "a!:7")
    // statics + fields work in expression position too
    assert(run(
      """var C = class { static K = 6; static times(n) { return this.K * n; } };
        |function f() { return C.times(7); }""".stripMargin, "f") == 42L)
  }

  test("static inheritance: derived classes see parent statics") {
    assert(run(
      """class A { static base() { return 10; } static K = 7; }
        |class B extends A { static own() { return 1; } }
        |class C extends B {}
        |function f() { return C.base() + C.own() + C.K + B.K; }""".stripMargin,
      "f") == 25L)
    // shadowing: the derived class's own static wins; the parent keeps its
    assert(run(
      """class A { static v() { return 'a'; } }
        |class B extends A { static v() { return 'b'; } }
        |function f() { return B.v() + A.v(); }""".stripMargin, "f") == "ba")
    // inherited static ACCESSORS: getter receiver is the derived class,
    // setter intercepts writes on the derived class
    assert(run(
      """class A {
        |  static get tag() { return this.name; }
        |  static set store(v) { this.saved = v; }
        |}
        |class B extends A {}
        |function f() { B.store = 42; return B.tag + ':' + B.saved + ':' + (A.saved === undefined); }""".stripMargin,
      "f") == "B:42:true")
    // a static missing from the whole chain is still the loud error
    val e = intercept[MiniJs.JsException](run(
      """class A {}
        |class B extends A {}
        |function f() { return B.nope(); }""".stripMargin, "f"))
    assert(e.getMessage.contains("nope is not supported"))
    // the inheritance link is NOT script-addressable: the reserved key
    // contains a space the lexer rejects in member names, so the old
    // dollar-spelled name is just a harmless own property and the chain
    // survives an attempted clobber (r12 ADVICE)
    assert(run(
      """class A { static base() { return 10; } }
        |class B extends A {}
        |function f() {
        |  B.__graft$staticparent = 'severed?';
        |  return B.base() + ':' + B.__graft$staticparent;
        |}""".stripMargin, "f") == "10:severed?")
  }

  test("new.target: set under new, undefined in plain calls, lexical in arrows") {
    assert(run(
      """function F() { this.nt = new.target === F ? 'F' : 'no'; }
        |function f() {
        |  var viaNew = new F().nt;
        |  var plain = 'x'; F.call({}); // plain call: new.target undefined
        |  function G() { return new.target === undefined; }
        |  return viaNew + ':' + G();
        |}""".stripMargin, "f") == "F:true")
    // arrows read it lexically from the enclosing frame
    assert(run(
      """function F() { var probe = () => new.target === F; this.ok = probe(); }
        |function f() { return new F().ok; }""".stripMargin, "f") == true)
    // explicit super(...) forwards the DERIVED class into the parent ctor
    assert(run(
      """class A { constructor() { this.nt = new.target.name; } }
        |class B extends A { constructor() { super(); } }
        |function f() { return new B().nt + ':' + new A().nt; }""".stripMargin,
      "f") == "B:A")
    // `new.x` is a loud parse error
    val e = intercept[MiniJs.JsException](
      run("function f() { return new.thing; }", "f"))
    assert(e.getMessage.contains("target"))
  }

  test("class getters/setters: deref on read, intercept on write") {
    val temp =
      """class Temp {
        |  constructor() { this.c = 0; }
        |  get fahrenheit() { return this.c * 9 / 5 + 32; }
        |  set fahrenheit(v) { this.c = (v - 32) * 5 / 9; }
        |}""".stripMargin
    assert(run(
      s"""$temp
         |function f() { var t = new Temp(); t.fahrenheit = 212; return t.c; }""".stripMargin,
      "f") == 100.0)
    assert(run(
      s"""$temp
         |function f() { var t = new Temp(); t.c = 100; return t.fahrenheit; }""".stripMargin,
      "f") == 212.0)
    // index access binds the accessor exactly like member access
    assert(run(
      s"""$temp
         |function f() { var t = new Temp(); t['fahrenheit'] = 32; return t['fahrenheit']; }""".stripMargin,
      "f") == 32.0)
    // compound assignment: getter then setter
    assert(run(
      """class Box {
        |  constructor() { this.v = 5; }
        |  get value() { return this.v; }
        |  set value(x) { this.v = x * 10; }
        |}
        |function f() { var b = new Box(); b.value += 1; return b.v; }""".stripMargin,
      "f") == 60L)
    // getter-only: write throws (strict mode); setter-only: read is undefined
    val e = intercept[MiniJs.JsException](run(
      """class R { get ro() { return 1; } }
        |function f() { var r = new R(); r.ro = 2; }""".stripMargin, "f"))
    assert(e.getMessage.contains("only a getter"))
    assert(run(
      """class W { set sink(v) { this.got = v; } }
        |function f() { var w = new W(); w.sink = 9; return '' + w.sink + w.got; }""".stripMargin,
      "f") == "undefined9")
    // static accessors live on the class function itself
    assert(run(
      """class S {
        |  static get version() { return 3; }
        |  static set version(v) { S.forced = v; }
        |}
        |function f() { S.version = 8; return S.version * 10 + S.forced; }""".stripMargin,
      "f") == 38L)
    // accessors are non-enumerable and not own: for..in and JSON skip
    // them, instance data stays visible
    assert(run(
      """class G { constructor() { this.a = 1; } get b() { return 2; } }
        |function f() {
        |  var g = new G(), ks = [];
        |  for (var k in g) { ks.push(k); }
        |  return ks.join(',') + '|' + JSON.stringify(g) + '|' + g.hasOwnProperty('b');
        |}""".stripMargin, "f") == "a|{\"a\":1}|false")
    // a getter on the prototype still sees the SUBCLASS receiver
    assert(run(
      """class Base { get tag() { return this.name + '!'; } }
        |class Kid extends Base { constructor() { super(); this.name = 'kid'; } }
        |function f() { return new Kid().tag; }""".stripMargin, "f") == "kid!")
    // methods named get/set still parse as methods
    assert(run(
      """class M { get() { return 'g'; } set(v) { return 's' + v; } static get_() { return 1; } }
        |function f() { var m = new M(); return m.get() + m.set(2); }""".stripMargin,
      "f") == "gs2")
  }
}
