package graft.enrich.js

import scala.collection.mutable

/** A small sandboxed JavaScript interpreter for the custom-mapper and
  * webhook-transform surfaces (M7/S7).
  *
  * The reference runs user mappers on Nashorn locked down hard: strict
  * mode, no syntax extensions, a class filter, and the host escape
  * hatches removed from the bindings — `Java`, `load`,
  * `loadWithNewGlobal`, `exit`, `quit`, `print`, `echo`, `readLine`,
  * `readFully` (JSCodeCompiler.java:44-120). This JVM ships no script
  * engine at all (Nashorn was removed in JDK 15; GraalJS is not on the
  * classpath), so the same contract is met with a purpose-built
  * interpreter: the sandbox is the language — there is no
  * reflection/host surface to filter, the reference's removed bindings
  * are explicitly poisoned so user code gets the same "not available"
  * failure, and a step budget + recursion cap bound runaway scripts
  * (the resource-exhaustion case TestJSCodeCompiler leaves commented
  * out).
  *
  * Supported subset (everything reference mapper examples use):
  * `var`/`function` declarations, closures, `if`/`else`, `while`,
  * `do..while`, `switch` (strict-equality cases, JS fallthrough),
  * classic `for`, `for..in`/`for..of`, `return`/`break`/`continue`,
  * `try`/`catch`/`finally`/`throw`, object/array literals, member +
  * index access, calls, `+ - * / %`, comparisons, `&& || !`, ternary,
  * compound assignment, regex literals (`/re/gim` with
  * `test`/`exec`/`match`/`replace`/`split`/`search`), string methods,
  * `Math`, `JSON`, `parseInt`/`parseFloat`, template literals
  * (`` `a ${x} b` ``, desugared to string concatenation; nesting a
  * template inside `${}` is rejected with a clear error), and
  * var/let/const destructuring (`var {a, b: c, d = 1} = o`,
  * `var [x, y = 2] = arr`, desugared to member reads off a one-time
  * temp — also legal in function/arrow PARAMETERS, with parameter
  * defaults), arrow functions (`x => x + 1`, `(a, b) => { … }` —
  * lexical `this`, never a constructor), object-literal property and
  * method shorthand (`{a, m(x){…}}`), `this` (bound by method calls
  * and `new`, `undefined` at top level — strict-mode semantics),
  * `new` over BUILT-IN constructors (`Date` with an injectable UTC
  * clock, the `Error` family, `RegExp`, `Array`, `Object`) AND over
  * script functions (instances carry a prototype link; method lookup
  * walks the chain; JSON/Object.keys see own properties only and
  * `for..in` adds inherited NON-function properties — modeling JS,
  * where class methods are non-enumerable but `Object.create` data
  * properties enumerate),
  * `F.prototype` wiring, `class` declarations with `extends`,
  * `super(…)`/`super.m(…)` and `static` methods (desugared to the
  * same prototype wiring), `instanceof` and the `in` operator,
  * `call`/`apply`/`bind`, `Object.create`/`getPrototypeOf`, and
  * `hasOwnProperty`. Numbers keep integral identity (Long) until an
  * operation forces a double — so ids survive a get/set round-trip,
  * which pure-double JS semantics would corrupt.
  * Also in: bare (non-declaration) destructuring assignments
  * (`({a, b: c} = o)`, `[x = 1, [y]] = arr` — desugared at parse time
  * to an immediately-invoked arrow doing plain member/index
  * assignments; object SHORTHAND defaults `({a = 1} = o)` stay a
  * parse error), `arguments` inside `function`s (array-like:
  * `length` + indexing; arrows fall through to the enclosing
  * function's binding, the JS rule), class FIELDS (instance fields
  * run in the constructor — after `super(…)` in a derived class;
  * static fields evaluate at definition time), and class
  * getters/setters (instance and static; reads deref with `this` =
  * the receiver, writes route through the chain's setter, a
  * getter-only write throws per strict mode, and accessor slots are
  * non-enumerable like methods).
  * Also in: object-literal `get`/`set` (merged get/set pairs, JSON
  * through the getter), `new.target` (per non-arrow frame, lexical for
  * arrows, forwarded through explicit `super(…)`), static inheritance
  * (`B.staticOfA()` walks the [[StaticParentKey]] chain, including
  * inherited static accessors), and class EXPRESSIONS (desugared to an
  * immediately-invoked arrow; an optional name binds only inside the
  * body).
  * Still out of scope: generators and `async` — the reference's
  * Nashorn is ES5.1, neither ever worked for its mapper scripts, and
  * a synchronous sandbox has no event loop to give `async` meaning.
  */
object MiniJs {

  final class JsException(msg: String) extends RuntimeException(msg)
  final class SandboxViolation(msg: String) extends RuntimeException(msg)

  /** Host object exposed to scripts: method-call surface plus an
    * optional closed set of readable constants (`Math.PI`) — still no
    * reflection, no open field access. */
  trait HostObject extends Serializable {
    def invoke(method: String, args: Seq[Any]): Any
    /** Readable constants; None = no such property (the default). */
    def prop(name: String): Option[Any] = None
  }

  // ---------- values ----------
  // Any is one of: null, java.lang.Boolean, java.lang.Long,
  // java.lang.Double, String, mutable.LinkedHashMap[String, Any] (object),
  // mutable.ArrayBuffer[Any] (array), Closure, HostObject, Undefined

  case object Undefined { override def toString = "undefined" }

  /** Reserved Closure-props key holding a class's superclass (the
    * `B.__proto__ = A` static-inheritance link). Contains a SPACE, a
    * character the lexer rejects inside identifiers and member names —
    * so no script can spell `C.<key>` to read or sever the link (and
    * computed index on a Closure throws), while the desugar's own AST
    * carries the key directly without lexing. Function props are not
    * enumerated, so it never leaks through for-in/JSON either. */
  val StaticParentKey = "__graft staticparent"

  final case class Closure(params: Seq[String], body: Seq[Stmt], env: Env,
      name: String, isArrow: Boolean = false) {
    /** Function-object properties (`F.prototype`, statics) — created
      * lazily so plain callbacks never allocate the map. */
    @transient private var propsOrNull: mutable.LinkedHashMap[String, Any] = _
    def props: mutable.LinkedHashMap[String, Any] = {
      if (propsOrNull == null) propsOrNull = mutable.LinkedHashMap.empty
      propsOrNull
    }
    def propsIfAny: Option[mutable.LinkedHashMap[String, Any]] =
      Option(propsOrNull)
  }

  /** `f.bind(thisArg, pre…)` — a callable wrapper; `new` on a bound
    * function constructs the TARGET with the bound args prepended and
    * the bound `this` ignored, the JS [[Construct]] rule. */
  final case class Bound(target: Any, thisVal: Any, pre: Seq[Any])

  /** An accessor property slot (class `get`/`set` desugar): each side
    * is a [[Closure]] or [[Undefined]]. Lives in prototype maps /
    * function props; every member READ derefs it (getter call with
    * `this` = the original receiver) and every member WRITE walks the
    * chain for it first (setter intercepts assignment) — so the value
    * itself is never observable from script code. */
  final case class Accessor(getter: Any, setter: Any)

  /** An object with a prototype link — created by `new` on a script
    * function, `Object.create`, and class `extends` wiring. It IS a
    * LinkedHashMap, so every existing plain-object code path (JSON,
    * `Object.keys`, the host boundary) sees exactly the OWN
    * properties — matching JS, where class methods are non-enumerable.
    * Member reads and `for..in` walk `proto` (the latter adding
    * inherited non-function properties, the `Object.create` data
    * case). Chains cannot cycle: every construct that sets `proto`
    * does so on a freshly created object. */
  @annotation.nowarn("cat=deprecation") // subclassing is deprecated for a
  // future-final LinkedHashMap; on the Scala this build pins it is the
  // only representation where every existing plain-object match site
  // (JSON, for..in, Object.keys, the host boundary) keeps working
  // unchanged on instances
  final class JsObj extends mutable.LinkedHashMap[String, Any] {
    var proto: Any = Undefined
  }

  final class Env(val parent: Option[Env]) {
    private val vars = mutable.Map.empty[String, Any]
    def declare(n: String, v: Any): Unit = vars(n) = v
    def lookup(n: String): Option[Any] =
      vars.get(n).orElse(parent.flatMap(_.lookup(n)))
    def assign(n: String, v: Any): Boolean =
      if (vars.contains(n)) { vars(n) = v; true }
      else parent.exists(_.assign(n, v))
  }

  // ---------- AST ----------
  sealed trait Expr
  final case class NumL(v: Long) extends Expr
  final case class NumD(v: Double) extends Expr
  final case class Str(v: String) extends Expr
  final case class Bool(v: Boolean) extends Expr
  case object NullE extends Expr
  case object UndefE extends Expr
  final case class Ident(name: String) extends Expr
  final case class ObjLit(entries: Seq[(String, Expr)]) extends Expr
  final case class ArrLit(items: Seq[Expr]) extends Expr
  final case class FunLit(params: Seq[String], body: Seq[Stmt], name: String,
      isArrow: Boolean = false) extends Expr
  /** `this` — bound by method calls and `new`; `undefined` at top level
    * (strict-mode semantics) and inside plain function calls. Arrow
    * functions don't bind it, so the lexical lookup falls through to
    * the enclosing method's binding — the JS arrow rule. */
  case object ThisE extends Expr
  /** `new.target` — the constructor a `new` expression invoked, or
    * undefined in a plain call. Bound per non-arrow call frame under a
    * dot-bearing name no identifier can shadow; arrows read it
    * lexically, like `this`. Known nit: a parent constructor reached
    * through an IMPLICIT derived ctor (the apply-forward desugar) reads
    * undefined where real JS reports the derived class. */
  case object NewTargetE extends Expr
  /** `super(…)` / `super.m(…)` — carries the class desugar's synthetic
    * superclass binding. Evaluated as a DIRECT this-bound call, so a
    * static method named `call` cannot hijack it (which a
    * `Sup.call(this, …)` rewrite would allow). `static` selects the
    * parent's statics instead of its prototype. */
  final case class SuperE(bind: String, method: Option[String],
      static: Boolean, args: Seq[Expr]) extends Expr
  /** INTERNAL (never parsed from source): the implicit derived-ctor
    * `super(...arguments)` forward — a direct parent-constructor call
    * with the frame's `arguments`, `this`, and `new.target`, immune to
    * any script-defined or inherited `apply`. */
  final case class SuperForwardE(bind: String) extends Expr
  final case class Member(target: Expr, name: String) extends Expr
  final case class IndexE(target: Expr, key: Expr) extends Expr
  final case class Call(target: Expr, args: Seq[Expr]) extends Expr
  final case class Unary(op: String, e: Expr) extends Expr
  final case class Bin(op: String, l: Expr, r: Expr) extends Expr
  final case class CondE(c: Expr, t: Expr, f: Expr) extends Expr
  final case class Assign(target: Expr, op: String, value: Expr) extends Expr
  /** `/pattern/flags` — compiled (and cached) by the evaluator. */
  final case class RegexL(pattern: String, flags: String) extends Expr
  /** `new Ctor(args)` — `ctor` is a member chain (`new a.b.C(x)`). An
    * `Ident` naming a built-in (Date, the Error family, RegExp, Array,
    * Object) that no script binding shadows constructs the built-in;
    * a script function constructs a [[JsObj]] on its `.prototype`. */
  final case class NewE(ctor: Expr, args: Seq[Expr]) extends Expr
  /** Builds an [[Accessor]] value — emitted only by the class desugar
    * (`Name.prototype.p = AccessorE(…)`); the engine's member-write
    * path installs an Accessor VALUE as an own property verbatim, so
    * installing never routes through an earlier accessor's setter. */
  final case class AccessorE(getter: Option[Expr], setter: Option[Expr])
      extends Expr

  sealed trait Stmt
  final case class VarDecl(entries: Seq[(String, Option[Expr])]) extends Stmt
  final case class ExprStmt(e: Expr) extends Stmt
  final case class IfS(c: Expr, t: Stmt, f: Option[Stmt]) extends Stmt
  final case class WhileS(c: Expr, body: Stmt) extends Stmt
  final case class ForS(init: Option[Stmt], cond: Option[Expr],
      step: Option[Expr], body: Stmt) extends Stmt
  /** `for (var k in obj) body` — keys of an object, indices of an
    * array/string (the reference's webhook transforms iterate request
    * bodies this way). */
  final case class ForInS(varName: String, obj: Expr, body: Stmt) extends Stmt
  /** `for (var v of arr) body` — VALUES of an array, characters of a
    * string (where for..in yields keys/indices). */
  final case class ForOfS(varName: String, obj: Expr, body: Stmt) extends Stmt
  /** `try { } catch (e) { } finally { }` — catch and finally each
    * optional (at least one present). A missing catch binding
    * (`catch { }`, ES2019) parses too. */
  final case class TryS(body: Stmt, catchVar: Option[String],
      catchBody: Option[Stmt], finallyBody: Option[Stmt]) extends Stmt
  final case class ThrowS(e: Expr) extends Stmt
  /** `switch (disc) { case e: … default: … }` — strict-equality match,
    * JS fallthrough, `break` exits the switch (not an enclosing loop).
    * `test` None = the default clause. */
  final case class SwitchS(disc: Expr,
      cases: Seq[(Option[Expr], Seq[Stmt])]) extends Stmt
  final case class DoWhileS(body: Stmt, cond: Expr) extends Stmt
  final case class ReturnS(e: Option[Expr]) extends Stmt
  case object BreakS extends Stmt
  case object ContinueS extends Stmt
  final case class Block(stmts: Seq[Stmt]) extends Stmt
  final case class FunDecl(name: String, params: Seq[String], body: Seq[Stmt]) extends Stmt
  /** A desugar product (class declarations) executed in the ENCLOSING
    * scope — unlike [[Block]], which opens one. */
  final case class Stmts(ss: Seq[Stmt]) extends Stmt

  // ---------- lexer ----------
  private final case class Tok(kind: String, text: String, pos: Int)

  /** After these keyword tokens a `/` starts a regex literal; after a
    * value-shaped token it is division. */
  private val regexAfterKw = Set("return", "typeof", "in", "of", "case",
    "throw", "else", "do", "instanceof", "delete", "void", "new")

  /** A `/` starts a regex literal unless the previous significant token
    * is value-shaped (number, string, regex, a non-keyword identifier,
    * a closing `)` / `]`, or a `++`/`--`) — the standard lexer-level JS
    * disambiguation from division. `++`/`--` count as value-ending
    * because the postfix form yields a value (`x++ / 2` is division)
    * while the prefix form followed by `/` would need a regex as its
    * assignable operand — never legal — so treating `/` as division
    * after them can't mis-lex a valid script. */
  private def regexAllowed(prev: Tok): Boolean = prev match {
    case null => true
    case Tok("num", _, _) | Tok("str", _, _) | Tok("regex", _, _) |
        Tok("template", _, _) => false
    case Tok("id", t, _) => regexAfterKw(t)
    case Tok("op", ")" | "]" | "++" | "--", _) => false
    case _ => true
  }

  /** Decode one backslash escape: `src(i)` is the character AFTER the
    * backslash. Returns (cooked text, source chars consumed). `\uXXXX`
    * and `\xXX` decode to their code unit (Nashorn-compatible — the
    * former lexer cooked `A` to the literal text "u0041"); a
    * malformed hex escape is a parse error, as in real JS, never a
    * silent mangle. Unknown single-char escapes cook to the bare
    * character (the JS rule that makes \` \$ \' work). */
  private def decodeEscape(src: String, i: Int,
      err: String => Nothing): (String, Int) = {
    // ASCII hex only — Character.digit/Integer.parseInt also accept
    // non-ASCII digit forms (e.g. fullwidth) that real JS rejects
    def isHex(c: Char): Boolean =
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
    def hex(from: Int, len: Int): Option[Int] =
      if (from + len <= src.length &&
        src.substring(from, from + len).forall(isHex))
        Some(Integer.parseInt(src.substring(from, from + len), 16))
      else None
    src.charAt(i) match {
      case 'n' => ("\n", 1); case 't' => ("\t", 1); case 'r' => ("\r", 1)
      case 'b' => ("\b", 1); case 'f' => ("\f", 1)
      case 'v' => ("\u000B", 1)
      case '0' if i + 1 >= src.length ||
          src.charAt(i + 1) < '0' || src.charAt(i + 1) > '9' =>
        ("\u0000", 1) // strict-mode JS: lone \0 is NUL, not the char '0'
      case d if d >= '0' && d <= '9' =>
        // \0<digit> / \1..\9 are legacy octal escapes — a SyntaxError
        // in strict mode, so a loud parse error here, never a mangle
        err("legacy octal escapes are not supported")
      case 'u' if i + 1 < src.length && src.charAt(i + 1) == '{' =>
        // ES2015 code-point escape: \u{1F600}, 1-6 hex digits
        val close = src.indexOf('}', i + 2)
        if (close < 0 || close == i + 2 || close - (i + 2) > 6 ||
          !src.substring(i + 2, close).forall(isHex))
          err("invalid \\u{} escape: expected 1-6 hex digits and '}'")
        else {
          val cp = Integer.parseInt(src.substring(i + 2, close), 16)
          if (cp > 0x10FFFF)
            err("invalid \\u{} escape: code point out of range")
          (new String(Character.toChars(cp)), close - i + 1)
        }
      case 'u' => hex(i + 1, 4) match {
        case Some(cp) => (cp.toChar.toString, 5)
        case None => err("invalid \\u escape: expected 4 hex digits")
      }
      case 'x' => hex(i + 1, 2) match {
        case Some(cp) => (cp.toChar.toString, 3)
        case None => err("invalid \\x escape: expected 2 hex digits")
      }
      case other => (other.toString, 1)
    }
  }

  private def lex(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var prev: Tok = null
    def add(t: Tok): Unit = { out += t; prev = t }
    var i = 0
    val n = src.length
    def err(m: String) = throw new JsException(s"lex error at $i: $m")
    while (i < n) {
      val c = src.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '/' && i + 1 < n && src.charAt(i + 1) == '/') {
        while (i < n && src.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && src.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(src.charAt(i) == '*' && src.charAt(i + 1) == '/')) i += 1
        if (i + 1 >= n) err("unterminated comment")
        i += 2
      } else if (c == '/' && regexAllowed(prev)) {
        // regex literal: body until the unescaped closing '/', honoring
        // character classes ('/[/]/' is legal), then flag letters. The
        // token text carries body and flags NUL-separated.
        val s = i; i += 1
        val sb = new StringBuilder
        var inClass = false
        var closed = false
        while (i < n && !closed) {
          val ch = src.charAt(i)
          if (ch == '\\' && i + 1 < n) { sb.append(ch).append(src.charAt(i + 1)); i += 2 }
          else if (ch == '\u0000') err("raw NUL in regex literals is not supported")
          else if (ch == '\n') err("unterminated regex")
          else if (ch == '[') { inClass = true; sb.append(ch); i += 1 }
          else if (ch == ']') { inClass = false; sb.append(ch); i += 1 }
          else if (ch == '/' && !inClass) { closed = true; i += 1 }
          else { sb.append(ch); i += 1 }
        }
        if (!closed) err("unterminated regex")
        val fs = new StringBuilder
        while (i < n && src.charAt(i).isLetter) { fs.append(src.charAt(i)); i += 1 }
        add(Tok("regex", sb.toString + "\u0000" + fs.toString, s))
      } else if (c == '`') {
        // template literal: alternating string parts and ${expr}
        // sources, encoded as NUL-separated segments each prefixed 'S'
        // (cooked string) or 'E' (raw expression source, re-lexed by
        // the parser). Nested templates inside ${} are rejected — the
        // one construct whose lexing would need a full mode stack.
        // Known limit: the hole scanner counts braces outside quoted
        // spans, so a regex literal with an UNBALANCED brace inside a
        // hole (`${s.replace(/[{]/, '')}`) mis-scans — assign the
        // regex to a var first; balanced braces and braces in string
        // literals are fine.
        val s = i; i += 1
        val segs = Vector.newBuilder[String]
        val sb = new StringBuilder("S")
        var closed = false
        while (i < n && !closed) {
          val ch = src.charAt(i)
          if (ch == '\\' && i + 1 < n) {
            // decodeEscape covers \` \$ \\ (bare-char rule) plus the
            // hex escapes; a cooked NUL would collide with the token
            // encoding's segment separator, so reject it explicitly
            val (cooked, used) = decodeEscape(src, i + 1, err)
            if (cooked.contains('\u0000'))
              err("NUL escapes in template literals are not supported")
            sb.append(cooked)
            i += 1 + used
          } else if (ch == '`') { closed = true; i += 1 }
          else if (ch == '\u0000')
            // a raw U+0000 would corrupt the NUL-separated segment
            // encoding exactly like the escaped form — same rejection
            err("raw NUL in template literals is not supported")
          else if (ch == '$' && i + 1 < n && src.charAt(i + 1) == '{') {
            segs += sb.toString; sb.clear(); sb.append('S')
            i += 2
            val es = new StringBuilder
            var depth = 1
            var quote: Char = 0
            while (i < n && depth > 0) {
              val ec = src.charAt(i)
              if (ec == '\u0000')
                err("raw NUL in template literals is not supported")
              if (quote != 0) {
                if (ec == '\\' && i + 1 < n) { es.append(ec).append(src.charAt(i + 1)); i += 2 }
                else { if (ec == quote) quote = 0; es.append(ec); i += 1 }
              } else ec match {
                case '`' => err("nested template literals are not supported")
                case '"' | '\'' => quote = ec; es.append(ec); i += 1
                case '{' => depth += 1; es.append(ec); i += 1
                case '}' =>
                  depth -= 1
                  if (depth > 0) es.append(ec)
                  i += 1
                case other => es.append(other); i += 1
              }
            }
            if (depth > 0) err("unterminated ${ in template literal")
            segs += "E" + es.toString
          } else { sb.append(ch); i += 1 }
        }
        if (!closed) err("unterminated template literal")
        segs += sb.toString
        add(Tok("template", segs.result().mkString("\u0000"), s))
      } else if (c.isDigit) {
        val s = i
        while (i < n && (src.charAt(i).isDigit || src.charAt(i) == '.')) i += 1
        add(Tok("num", src.substring(s, i), s))
      } else if (c == '"' || c == '\'') {
        val q = c; val sb = new StringBuilder; i += 1
        while (i < n && src.charAt(i) != q) {
          val ch = src.charAt(i)
          if (ch == '\\' && i + 1 < n) {
            val (cooked, used) = decodeEscape(src, i + 1, err)
            sb.append(cooked)
            i += 1 + used
          } else { sb.append(ch); i += 1 }
        }
        if (i >= n) err("unterminated string")
        i += 1
        add(Tok("str", sb.toString, i))
      } else if (c.isLetter || c == '_' || c == '$') {
        val s = i
        while (i < n && (src.charAt(i).isLetterOrDigit || src.charAt(i) == '_' || src.charAt(i) == '$')) i += 1
        add(Tok("id", src.substring(s, i), s))
      } else {
        val three = if (i + 3 <= n) src.substring(i, i + 3) else ""
        val two = if (i + 2 <= n) src.substring(i, i + 2) else ""
        if (three == "===" || three == "!==") { add(Tok("op", three, i)); i += 3 }
        else if (Set("==", "!=", "<=", ">=", "&&", "||", "+=", "-=", "*=", "/=", "%=", "++", "--", "=>").contains(two)) {
          add(Tok("op", two, i)); i += 2
        } else if ("+-*/%<>=!(){}[],;:?.&|^~".indexOf(c) >= 0) {
          add(Tok("op", c.toString, i)); i += 1
        } else err(s"unexpected character '$c'")
      }
    }
    out += Tok("eof", "", n)
    out.result()
  }

  // ---------- parser (Pratt) ----------
  private final class Parser(toks: Vector[Tok]) {
    private var p = 0
    private def cur: Tok = toks(p)
    private def err(m: String) =
      throw new JsException(s"parse error near '${cur.text}' (pos ${cur.pos}): $m")
    private def eat(): Tok = { val t = cur; p += 1; t }
    private def expectOp(o: String): Unit =
      if (cur.kind == "op" && cur.text == o) p += 1 else err(s"expected '$o'")
    private def isOp(o: String): Boolean = cur.kind == "op" && cur.text == o
    private def isKw(k: String): Boolean = cur.kind == "id" && cur.text == k

    def program(): Seq[Stmt] = {
      val b = Seq.newBuilder[Stmt]
      while (cur.kind != "eof") b += statement()
      b.result()
    }

    private def statement(): Stmt = {
      // same guard as expr(): '{{{{…}}}}' recurses through statement()
      exprDepth += 1
      if (exprDepth > 256)
        throw new JsException("statement nesting too deep (max 256)")
      try statement0() finally exprDepth -= 1
    }

    private def statement0(): Stmt = {
      if (isKw("var") || isKw("let") || isKw("const")) { eat(); varDecl() }
      else if (isKw("function")) { eat(); funDecl() }
      else if (isKw("class")) { eat(); classDecl() }
      else if (isKw("if")) { eat(); ifStmt() }
      else if (isKw("while")) { eat(); whileStmt() }
      else if (isKw("do")) { eat(); doWhileStmt() }
      else if (isKw("switch")) { eat(); switchStmt() }
      else if (isKw("for")) { eat(); forStmt() }
      else if (isKw("return")) {
        eat()
        val e = if (isOp(";") || isOp("}") || cur.kind == "eof") None else Some(expr())
        if (isOp(";")) eat()
        ReturnS(e)
      }
      else if (isKw("break")) { eat(); if (isOp(";")) eat(); BreakS }
      else if (isKw("continue")) { eat(); if (isOp(";")) eat(); ContinueS }
      else if (isKw("try")) { eat(); tryStmt() }
      else if (isKw("throw")) {
        eat(); val e = expr(); if (isOp(";")) eat(); ThrowS(e)
      }
      else if (isOp("{")) block()
      else if (isOp(";")) { eat(); Block(Nil) }
      else { val e = expr(); if (isOp(";")) eat(); ExprStmt(e) }
    }

    /** Parse one `${}` segment of a template literal: a complete
      * expression with nothing trailing. */
    def parseSubExpr(src: String): Expr = {
      val sub = new Parser(lex(src))
      // the hole is lexically inside the enclosing method — `this` and
      // `super` must resolve exactly as they would outside the template
      sub.superName = superName
      sub.superStatic = superStatic
      val e = sub.expr()
      if (sub.cur.kind != "eof")
        err(s"unexpected tokens after template expression '$src'")
      e
    }

    /** Fresh per-parser temp names for destructuring desugar — `$` is
      * legal in identifiers but scripts never start names with `__$`,
      * so the temps can't collide with user bindings. */
    private var destrN = 0
    private def destrTmp(): String = { destrN += 1; s"__$$destr$destrN" }

    /** `undefined`-guarded access with an optional default — the JS
      * destructuring-default rule (`{a = 1}` applies 1 only when the
      * property is undefined, not merely falsy). */
    private def withDefault(access: Expr, default: Option[Expr]): Expr =
      default match {
        case None => access
        case Some(d) => CondE(Bin("===", access, UndefE), d, access)
      }

    /** `this` and `super` can never be binding names — a declaration
      * using one would silently shadow the engine's bindings. */
    private def checkName(n: String): String =
      if (n == "this" || n == "super")
        err(s"'$n' is a reserved word")
      else n

    /** Parses one object/array destructuring pattern (cursor ON the
      * opening `{`/`[`). Each binding is (name, accessor) where the
      * accessor reads the bound value off a once-evaluated temp. */
    private def destrPattern(): Seq[(String, Expr => Expr)] = {
      val isObj = eat().text == "{"
      val binds = Seq.newBuilder[(String, Expr => Expr)]
      if (isObj) {
        var go = !isOp("}")
        while (go) {
          if (cur.kind != "id") err("expected destructuring key")
          val key = eat().text
          val target = if (isOp(":")) {
            eat()
            if (cur.kind != "id") err("expected destructuring binding name")
            eat().text
          } else key
          val default = if (isOp("=")) { eat(); Some(expr()) } else None
          binds += checkName(target) -> (tmp =>
            withDefault(Member(tmp, key), default))
          if (isOp(",")) eat() else go = false
        }
        expectOp("}")
      } else {
        var idx = 0
        var go = !isOp("]")
        while (go) {
          if (cur.kind != "id") err("expected destructuring binding name")
          val name = eat().text
          val default = if (isOp("=")) { eat(); Some(expr()) } else None
          val i = idx
          binds += checkName(name) -> (tmp =>
            withDefault(IndexE(tmp, NumL(i.toLong)), default))
          idx += 1
          if (isOp(",")) eat() else go = false
        }
        expectOp("]")
      }
      binds.result()
    }

    private def varDecl(): Stmt = {
      val entries = Seq.newBuilder[(String, Option[Expr])]
      var more = true
      while (more) {
        if (isOp("{") || isOp("[")) {
          // destructuring declaration, desugared to member/index reads
          // off a once-evaluated temp: var {a, b: c, d = 1} = RHS →
          // var __$destrN = RHS, a = __$destrN.a, c = __$destrN.b,
          // d = (__$destrN.d === undefined ? 1 : __$destrN.d)
          val binds = destrPattern()
          if (!isOp("=")) err("destructuring declaration needs an initializer")
          eat()
          val tmpName = destrTmp()
          entries += tmpName -> Some(expr())
          binds.foreach { case (name, mk) =>
            entries += name -> Some(mk(Ident(tmpName)))
          }
        } else {
          if (cur.kind != "id") err("expected variable name")
          val name = checkName(eat().text)
          val init = if (isOp("=")) { eat(); Some(expr()) } else None
          entries += name -> init
        }
        if (isOp(",")) eat() else more = false
      }
      if (isOp(";")) eat()
      VarDecl(entries.result())
    }

    private def funDecl(): Stmt = {
      if (cur.kind != "id") err("expected function name")
      val name = checkName(eat().text)
      val (ps, body) = funRest()
      FunDecl(name, ps, body)
    }

    /** Parses `(param, …)` where each param is a plain name, a name
      * with a default (`a = 1`), or a destructuring pattern with an
      * optional whole-pattern default (`{a, b} = {}`). Defaults and
      * patterns desugar to prefix statements prepended to the body —
      * the same temp-read strategy as destructuring declarations. */
    private def paramList(): (Seq[String], Seq[Stmt]) = {
      val ps = Seq.newBuilder[String]
      val prefix = Seq.newBuilder[Stmt]
      if (!isOp(")")) {
        var more = true
        while (more) {
          if (isOp("{") || isOp("[")) {
            val binds = destrPattern()
            val tmp = destrTmp()
            if (isOp("=")) {
              eat()
              val d = expr()
              prefix += VarDecl(Seq(
                tmp -> Some(withDefault(Ident(tmp), Some(d)))))
            }
            ps += tmp
            prefix += VarDecl(binds.map { case (n, mk) =>
              n -> Some(mk(Ident(tmp)))
            })
          } else {
            if (cur.kind != "id") err("expected parameter name")
            val name = checkName(eat().text)
            if (isOp("=")) {
              eat()
              val d = expr()
              prefix += VarDecl(Seq(
                name -> Some(withDefault(Ident(name), Some(d)))))
            }
            ps += name
          }
          if (isOp(",")) eat() else more = false
        }
      }
      (ps.result(), prefix.result())
    }

    /** One parenthesized call-argument list, cursor ON the `(`. */
    private def argList(): Seq[Expr] = {
      expectOp("(")
      val args = Seq.newBuilder[Expr]
      if (!isOp(")")) {
        var more = true
        while (more) {
          args += assignExpr(); if (isOp(",")) eat() else more = false
        }
      }
      expectOp(")")
      args.result()
    }

    private def funRest(): (Seq[String], Seq[Stmt]) = {
      expectOp("(")
      val (ps, prefix) = paramList()
      expectOp(")")
      expectOp("{")
      val body = Seq.newBuilder[Stmt]
      while (!isOp("}")) body += statement()
      expectOp("}")
      (ps, prefix ++ body.result())
    }

    /** `class Name [extends Expr] { constructor(){} m(){} static s(){} }`
      * desugared to public-knowledge prototype wiring: a FunDecl for the
      * constructor, `Name.prototype = Object.create(Sup.prototype)` when
      * extending, method assignments onto the prototype, statics onto
      * the constructor. `super(…)` / `super.m(…)` rewrite to
      * `Sup.call(this, …)` / `Sup.prototype.m.call(this, …)` against a
      * synthetic binding holding the evaluated superclass expression.
      * A ctor-less derived class forwards 8 positional parameters —
      * observationally equivalent here, where no `arguments` object
      * exists to count them. Fields and get/set accessors are in;
      * derived-class fields require `super(...)` as a top-level
      * constructor statement (nested forms rejected loudly) and init
      * via [[Set]] (ES2022 uses [[Define]] — noted at the insertion
      * point). Out of scope: class expressions, `new.target`. */
    private def classDecl(): Stmt = {
      if (cur.kind != "id") err("expected class name")
      val name = checkName(eat().text)
      classRest(name)
    }

    /** Class EXPRESSION (`var C = class [Name] [extends E] { … }`,
      * `mixin(class extends B { … })`): the same desugar as a
      * declaration, wrapped in an immediately-invoked ARROW returning
      * the constructor — arrows keep `this`/`arguments` lexical and
      * give the body its own scope, so a Name (when present) is
      * visible only inside the class body, per JS. Nit: an anonymous
      * class's `.name` reads the synthetic binding, not the ES2015
      * NamedEvaluation name. */
    private def classExpr(): Expr = {
      val name =
        // the synthetic binding carries a space so no script inside the
        // class body can name-collide with (or rebind) it
        if (cur.kind == "id" && cur.text != "extends") checkName(eat().text)
        else "__graft classexpr"
      val ss = classRest(name).ss
      Call(FunLit(Seq.empty, ss :+ ReturnS(Some(Ident(name))), "",
        isArrow = true), Seq.empty)
    }

    /** `[extends E] { members }` of a class whose name is already
      * consumed — parses and desugars to prototype-wiring statements. */
    private def classRest(name: String): Stmts = {
      val superE = if (isKw("extends")) { eat(); Some(postfixExpr()) } else None
      val supTmp = superE.map { _ => s"__$$super$$$name" }
      expectOp("{")
      val savedSuper = superName
      superName = supTmp
      var ctor: Option[(Seq[String], Seq[Stmt])] = None
      // does the ctor body contain super(...) ANYWHERE (incl. nested in
      // expressions)? drives the field-insertion guard below
      var ctorUsesSuper = false
      val protoMs = Seq.newBuilder[(String, Seq[String], Seq[Stmt])]
      val staticMs = Seq.newBuilder[(String, Seq[String], Seq[Stmt])]
      // fields (name, initializer) and accessors (name → get/set
      // FunLit), instance and static each
      val instFields = Seq.newBuilder[(String, Option[Expr])]
      val staticFields = Seq.newBuilder[(String, Option[Expr])]
      val protoAcc = mutable.LinkedHashMap.empty[String, (Option[Expr], Option[Expr])]
      val staticAcc = mutable.LinkedHashMap.empty[String, (Option[Expr], Option[Expr])]
      try {
        while (!isOp("}")) {
          if (isOp(";")) eat()
          else {
            // `static` is contextual: a modifier only when a member
            // name follows (so a member NAMED static still parses)
            val isStatic = isKw("static") && toks(p + 1).kind == "id"
            if (isStatic) eat()
            if (cur.kind != "id") err("expected member name in class body")
            val mName = eat().text
            // `get`/`set` are contextual too: accessor only when the
            // PROPERTY name follows (so a method/field named get/set
            // still parses)
            if ((mName == "get" || mName == "set") && cur.kind == "id") {
              val pName = eat().text
              val savedStatic = superStatic
              superStatic = isStatic
              val (ps, body) = try funRest() finally superStatic = savedStatic
              if (mName == "get" && ps.nonEmpty) err("getter takes no parameters")
              if (mName == "set" && ps.size != 1)
                err("setter takes exactly one parameter")
              val tgt = if (isStatic) staticAcc else protoAcc
              val (g, s) = tgt.getOrElse(pName, (None, None))
              val lit = Some(FunLit(ps, body, pName))
              tgt(pName) = if (mName == "get") (lit, s) else (g, lit)
            } else if (isOp("(")) {
              val savedStatic = superStatic
              superStatic = isStatic
              val savedSawSuper = sawSuperCall
              sawSuperCall = false
              val (ps, body) = try funRest() finally superStatic = savedStatic
              val bodySawSuper = sawSuperCall
              sawSuperCall = savedSawSuper
              if (mName == "constructor" && !isStatic) {
                if (ctor.isDefined) err("duplicate constructor")
                ctorUsesSuper = bodySawSuper
                ctor = Some((ps, body))
              } else if (isStatic) staticMs += ((mName, ps, body))
              else protoMs += ((mName, ps, body))
            } else {
              // class field: `name = expr;` or bare `name;`
              val init = if (isOp("=")) { eat(); Some(assignExpr()) } else None
              if (isOp(";")) eat()
              if (isStatic) staticFields += mName -> init
              else instFields += mName -> init
            }
          }
        }
      } finally superName = savedSuper
      expectOp("}")

      val stmts = Seq.newBuilder[Stmt]
      supTmp.zip(superE).foreach { case (t, e) =>
        stmts += VarDecl(Seq(t -> Some(e)))
      }
      val (cps, cbody) = ctor.getOrElse {
        supTmp match {
          case Some(t) =>
            // implicit derived ctor: super(...arguments) — forwarded
            // through an INTERNAL node rather than `Sup.apply(...)`,
            // so an inherited `static apply` (legal JS) cannot hijack
            // the desugar's own mechanics, and new.target forwards
            (Seq.empty[String],
              Seq(ExprStmt(SuperForwardE(t))): Seq[Stmt])
          case None => (Seq.empty[String], Seq.empty[Stmt])
        }
      }
      // instance fields run inside the constructor: after the
      // top-level super(…) call in a derived class (the JS field
      // timing — the parent must have initialized first), else first.
      // Scope note: field init assigns via [[Set]] (so an inherited
      // setter intercepts), where ES2022 prescribes [[Define]]; the
      // accessor-free mapper scripts this engine hosts never see the
      // difference, and the divergence is documented here rather than
      // silently wrong.
      val fieldInits = instFields.result().map { case (f, init) =>
        ExprStmt(Assign(Member(ThisE, f), "=", init.getOrElse(UndefE)))
      }
      val cbodyWithFields =
        if (fieldInits.isEmpty) cbody
        else {
          val at = cbody.indexWhere {
            case ExprStmt(SuperE(_, None, false, _)) => true
            case ExprStmt(SuperForwardE(t)) if supTmp.contains(t) => true
            case _ => false
          }
          if (at >= 0) cbody.patch(at + 1, fieldInits, 0)
          else if (supTmp.isDefined && ctorUsesSuper)
            // a super(...) nested in a conditional/expression would make
            // fields run BEFORE the parent constructor — inverted JS
            // ordering; reject loudly like other unsupported forms
            err("class fields in a derived class require super(...) as a " +
              "top-level constructor statement")
          else fieldInits ++ cbody
        }
      stmts += FunDecl(name, cps, cbodyWithFields)
      supTmp.foreach { t =>
        stmts += ExprStmt(Assign(Member(Ident(name), "prototype"), "=",
          Call(Member(Ident("Object"), "create"),
            Seq(Member(Ident(t), "prototype")))))
        // static inheritance: `B.__proto__ = A` in real JS — recorded
        // under a reserved props key the member-read chain walks, so
        // `B.staticOfA` (and inherited static accessors) resolve
        stmts += ExprStmt(Assign(
          Member(Ident(name), StaticParentKey), "=", Ident(t)))
      }
      protoMs.result().foreach { case (m, ps, body) =>
        stmts += ExprStmt(Assign(
          Member(Member(Ident(name), "prototype"), m), "=",
          FunLit(ps, body, m)))
      }
      staticMs.result().foreach { case (m, ps, body) =>
        stmts += ExprStmt(Assign(Member(Ident(name), m), "=",
          FunLit(ps, body, m)))
      }
      protoAcc.foreach { case (pn, (g, s)) =>
        stmts += ExprStmt(Assign(
          Member(Member(Ident(name), "prototype"), pn), "=", AccessorE(g, s)))
      }
      staticAcc.foreach { case (pn, (g, s)) =>
        stmts += ExprStmt(Assign(Member(Ident(name), pn), "=", AccessorE(g, s)))
      }
      // static fields evaluate at class-definition time, in order
      staticFields.result().foreach { case (f, init) =>
        stmts += ExprStmt(Assign(Member(Ident(name), f), "=",
          init.getOrElse(UndefE)))
      }
      Stmts(stmts.result())
    }

    /** The synthetic superclass binding of the class body being parsed
      * (None outside a derived class) — drives `super` rewriting. */
    private var superName: Option[String] = None

    /** True while parsing a STATIC method body: there `super.m(…)`
      * resolves to the parent's statics (`Sup.m`), not its prototype,
      * and `super(…)` is illegal — the JS rules. */
    private var superStatic: Boolean = false

    /** Set when a `super(...)` CALL parses anywhere in the current
      * method body (saved/restored per member) — the class desugar uses
      * it to reject derived-class fields whose super call is not a
      * top-level statement. */
    private var sawSuperCall: Boolean = false

    private def ifStmt(): Stmt = {
      expectOp("("); val c = expr(); expectOp(")")
      val t = statement()
      val f = if (isKw("else")) { eat(); Some(statement()) } else None
      IfS(c, t, f)
    }

    private def whileStmt(): Stmt = {
      expectOp("("); val c = expr(); expectOp(")")
      WhileS(c, statement())
    }

    private def doWhileStmt(): Stmt = {
      val body = statement()
      if (!isKw("while")) err("expected while after do body")
      eat()
      expectOp("("); val c = expr(); expectOp(")")
      if (isOp(";")) eat()
      DoWhileS(body, c)
    }

    private def switchStmt(): Stmt = {
      expectOp("("); val disc = expr(); expectOp(")")
      expectOp("{")
      val cases = Seq.newBuilder[(Option[Expr], Seq[Stmt])]
      while (!isOp("}")) {
        val test =
          if (isKw("case")) { eat(); val e = expr(); Some(e) }
          else if (isKw("default")) { eat(); None }
          else err("expected case or default in switch")
        expectOp(":")
        val body = Seq.newBuilder[Stmt]
        while (!isOp("}") && !isKw("case") && !isKw("default"))
          body += statement()
        cases += test -> body.result()
      }
      expectOp("}")
      SwitchS(disc, cases.result())
    }

    private def tryStmt(): Stmt = {
      val body = block()
      val (cvar, cbody) =
        if (isKw("catch")) {
          eat()
          val v = if (isOp("(")) {
            eat()
            if (cur.kind != "id") err("expected catch binding")
            val name = checkName(eat().text)
            expectOp(")")
            Some(name)
          } else None // ES2019 optional catch binding
          (v, Some(block()))
        } else (None, None)
      val fin = if (isKw("finally")) { eat(); Some(block()) } else None
      if (cbody.isEmpty && fin.isEmpty) err("try needs catch or finally")
      TryS(body, cvar, cbody, fin)
    }

    private def forStmt(): Stmt = {
      expectOp("(")
      // for (var k in obj) / for (k in obj) / the 'of' twins — lookahead
      val loopKw = {
        val at = if (isKw("var") || isKw("let") || isKw("const")) p + 1 else p
        if (toks(at).kind == "id" && at + 1 < toks.length &&
          toks(at + 1).kind == "id" &&
          (toks(at + 1).text == "in" || toks(at + 1).text == "of"))
          Some(toks(at + 1).text)
        else None
      }
      if (loopKw.isDefined) {
        if (isKw("var") || isKw("let") || isKw("const")) eat()
        val name = checkName(eat().text)
        eat() // 'in' | 'of'
        val obj = expr()
        expectOp(")")
        return if (loopKw.contains("in")) ForInS(name, obj, statement())
        else ForOfS(name, obj, statement())
      }
      val init = if (isOp(";")) { eat(); None }
        else if (isKw("var")) { eat(); Some(varDecl()) }
        else { val e = ExprStmt(expr()); if (isOp(";")) eat(); Some(e) }
      val cond = if (isOp(";")) None else Some(expr())
      expectOp(";")
      val step = if (isOp(")")) None else Some(expr())
      expectOp(")")
      ForS(init, cond, step, statement())
    }

    private def block(): Stmt = {
      expectOp("{")
      val b = Seq.newBuilder[Stmt]
      while (!isOp("}")) b += statement()
      expectOp("}")
      Block(b.result())
    }

    // Nesting guard: the parser is recursive-descent, so a data- or
    // user-supplied script like '((((…1…))))' would otherwise throw
    // StackOverflowError — an Error, not Exception, which escapes every
    // catch and kills the executor. Cap expression nesting like the
    // evaluator caps call recursion.
    private var exprDepth = 0
    def expr(): Expr = {
      exprDepth += 1
      if (exprDepth > 256)
        throw new JsException("expression nesting too deep (max 256)")
      try assignExpr() finally exprDepth -= 1
    }

    /** Arrow-function lookahead: `x => …` or `(…) => …`. The paren form
      * scans to the matching `)` in the token stream — cheap, bounded,
      * and the only backtrack-free way to split it from a parenthesized
      * expression. */
    private def arrowAhead(): Boolean = {
      if (cur.kind == "id" && !regexAfterKw(cur.text) &&
        toks(p + 1).kind == "op" && toks(p + 1).text == "=>") true
      else if (isOp("(")) {
        var q = p + 1
        var depth = 1
        while (depth > 0 && toks(q).kind != "eof") {
          if (toks(q).kind == "op" && toks(q).text == "(") depth += 1
          else if (toks(q).kind == "op" && toks(q).text == ")") depth -= 1
          q += 1
        }
        depth == 0 && toks(q).kind == "op" && toks(q).text == "=>"
      } else false
    }

    /** `params => body` desugared to a function literal; an expression
      * body is an implicit return. Arrows carry `isArrow = true`: they
      * do NOT bind `this`, so a `this` inside one resolves lexically to
      * the enclosing method's binding — the JS arrow rule. */
    private def arrowFun(): Expr = {
      val (ps, prefix) =
        if (cur.kind == "id") (Seq(checkName(eat().text)), Seq.empty[Stmt])
        else {
          expectOp("(")
          val r = paramList()
          expectOp(")")
          r
        }
      expectOp("=>")
      val body =
        if (isOp("{")) block() match {
          case Block(stmts) => stmts
          case other => Seq(other)
        }
        else Seq(ReturnS(Some(expr())))
      FunLit(ps, prefix ++ body, "", isArrow = true)
    }

    private def assignExpr(): Expr = {
      if (arrowAhead()) return arrowFun()
      val lhs = condExpr()
      if (cur.kind == "op" && Set("=", "+=", "-=", "*=", "/=", "%=").contains(cur.text)) {
        lhs match {
          case _: Ident | _: Member | _: IndexE =>
            val op = eat().text
            Assign(lhs, op, assignExpr())
          case (_: ObjLit | _: ArrLit) if cur.text == "=" =>
            // bare destructuring assignment: `({a, b} = o)`, `[x, y] = a`
            // — the pattern arrives parsed as a literal whose values
            // must all be assignable targets (plain JS requires the
            // object form parenthesized at statement level, which the
            // block/ObjLit split already enforces). Compound ops on a
            // pattern are illegal, as in JS. Desugared HERE, at parse
            // time, to an immediately-invoked arrow (lexical `this` and
            // `arguments` fall through, matching JS) that performs
            // plain member/index assignments off a once-evaluated temp
            // and returns the rhs — the result value of an assignment.
            validatePattern(lhs)
            eat()
            desugarPatternAssign(lhs, assignExpr())
          case _ => err("invalid assignment target")
        }
      } else lhs
    }

    /** Every leaf of a destructuring-assignment pattern must itself be
      * an assignable target — with an optional `= default` (parsed as
      * a nested plain `=` Assign: `[x = 1]`, `{a: b = 1}`); method
      * shorthand, computed values, or compound ops make it a plain
      * (non-pattern) literal and are rejected here. Object SHORTHAND
      * defaults (`{a = 1} = o`) never reach this point — the object-
      * literal grammar rejects them with "expected :" at parse time. */
    private def validatePattern(e: Expr): Unit = e match {
      case _: Ident | _: Member | _: IndexE => ()
      case Assign(target, "=", _) => validatePattern(target)
      case ObjLit(entries) => entries.foreach { case (_, v) => validatePattern(v) }
      case ArrLit(items) => items.foreach(validatePattern)
      case _ => err("invalid destructuring assignment target")
    }

    private def desugarPatternAssign(pat: Expr, rhs: Expr): Expr = {
      val tmp = destrTmp()
      val stmts = patternAssigns(pat, Ident(tmp))
      Call(FunLit(Seq(tmp), stmts :+ ReturnS(Some(Ident(tmp))), "",
        isArrow = true), Seq(rhs))
    }

    /** Assignment statements for one validated pattern leaf/branch
      * reading from `access` (always a pure temp/member/index read, so
      * the default guard's double evaluation is side-effect-free). */
    private def patternAssigns(pat: Expr, access: Expr): Seq[Stmt] = pat match {
      case Assign(target, _, default) =>
        patternAssigns(target, withDefault(access, Some(default)))
      case ObjLit(entries) =>
        val t = destrTmp()
        VarDecl(Seq(t -> Some(access))) +: entries.flatMap { case (k, v) =>
          patternAssigns(v, Member(Ident(t), k))
        }
      case ArrLit(items) =>
        val t = destrTmp()
        VarDecl(Seq(t -> Some(access))) +: items.zipWithIndex.flatMap {
          case (it, i) => patternAssigns(it, IndexE(Ident(t), NumL(i.toLong)))
        }
      case target => Seq(ExprStmt(Assign(target, "=", access)))
    }

    private def condExpr(): Expr = {
      val c = orExpr()
      if (isOp("?")) {
        eat(); val t = assignExpr(); expectOp(":"); val f = assignExpr()
        CondE(c, t, f)
      } else c
    }

    private def orExpr(): Expr = {
      var l = andExpr()
      while (isOp("||")) { eat(); l = Bin("||", l, andExpr()) }
      l
    }
    private def andExpr(): Expr = {
      var l = eqExpr()
      while (isOp("&&")) { eat(); l = Bin("&&", l, eqExpr()) }
      l
    }
    private def eqExpr(): Expr = {
      var l = relExpr()
      while (cur.kind == "op" && Set("==", "!=", "===", "!==").contains(cur.text)) {
        val op = eat().text; l = Bin(op, l, relExpr())
      }
      l
    }
    private def relExpr(): Expr = {
      var l = addExpr()
      while ((cur.kind == "op" &&
        Set("<", "<=", ">", ">=").contains(cur.text)) ||
        isKw("instanceof") || isKw("in")) {
        // `for (k in o)` never reaches here — the for-header lookahead
        // consumes that form before expression parsing starts
        val op = eat().text; l = Bin(op, l, addExpr())
      }
      l
    }
    private def addExpr(): Expr = {
      var l = mulExpr()
      while (isOp("+") || isOp("-")) { val op = eat().text; l = Bin(op, l, mulExpr()) }
      l
    }
    private def mulExpr(): Expr = {
      var l = unaryExpr()
      while (isOp("*") || isOp("/") || isOp("%")) {
        val op = eat().text; l = Bin(op, l, unaryExpr())
      }
      l
    }
    private def unaryExpr(): Expr = {
      if (isOp("!")) { eat(); Unary("!", unaryExpr()) }
      else if (isOp("-")) { eat(); Unary("-", unaryExpr()) }
      else if (isOp("+")) { eat(); Unary("+", unaryExpr()) }
      else if (isKw("typeof")) { eat(); Unary("typeof", unaryExpr()) }
      else if (isOp("++") || isOp("--")) {
        val op = eat().text
        val t = unaryExpr()
        Assign(t, if (op == "++") "+=" else "-=", NumL(1L))
      }
      else postfixExpr()
    }

    private def postfixExpr(): Expr = {
      var e = primary()
      var going = true
      while (going) {
        if (isOp(".")) {
          eat()
          if (cur.kind != "id") err("expected property name")
          e = Member(e, eat().text)
        } else if (isOp("[")) {
          eat(); val k = expr(); expectOp("]"); e = IndexE(e, k)
        } else if (isOp("(")) {
          e = Call(e, argList())
        } else if (isOp("++") || isOp("--")) {
          // postfix inc/dec evaluates to the OLD value: rewrite i++ as
          // (i += 1) - 1 — numerically exact for Long and Double, and
          // a script like `a[i++]` indexes the pre-increment position
          val op = eat().text
          e =
            if (op == "++") Bin("-", Assign(e, "+=", NumL(1L)), NumL(1L))
            else Bin("+", Assign(e, "-=", NumL(1L)), NumL(1L))
        } else going = false
      }
      e
    }

    private def primary(): Expr = {
      if (cur.kind == "num") {
        val t = eat().text
        if (t.contains('.')) NumD(t.toDouble) else NumL(t.toLong)
      }
      else if (cur.kind == "str") Str(eat().text)
      else if (cur.kind == "template") {
        // desugar to left-assoc string concatenation seeded by the
        // (possibly empty) leading string part, so `+` stays concat
        // even when every interpolated value is numeric
        val segs = eat().text.split('\u0000')
        segs.foldLeft(None: Option[Expr]) { (acc, seg) =>
          val piece: Expr =
            if (seg.startsWith("S")) Str(seg.drop(1))
            else parseSubExpr(seg.drop(1))
          acc match {
            case None =>
              // seed with the first (string) part; an 'E' first segment
              // cannot happen — the lexer always emits a leading 'S'
              Some(piece)
            case Some(l) => Some(Bin("+", l, piece))
          }
        }.getOrElse(Str(""))
      }
      else if (cur.kind == "regex") {
        val t = eat().text
        val sep = t.lastIndexOf('\u0000')
        RegexL(t.substring(0, sep), t.substring(sep + 1))
      }
      else if (isKw("true")) { eat(); Bool(true) }
      else if (isKw("false")) { eat(); Bool(false) }
      else if (isKw("null")) { eat(); NullE }
      else if (isKw("undefined")) { eat(); UndefE }
      else if (isKw("function")) {
        eat()
        val name = if (cur.kind == "id" && !isOp("(")) eat().text else ""
        val (ps, body) = funRest()
        FunLit(ps, body, name)
      }
      else if (isKw("this")) { eat(); ThisE }
      else if (isKw("class")) { eat(); classExpr() }
      else if (isKw("super")) {
        // lexical resolution against the class desugar's synthetic
        // superclass binding; only the two callable forms JS allows
        eat()
        val sup = superName.getOrElse(
          err("'super' is only valid inside a derived class"))
        if (isOp("(")) {
          if (superStatic) err("super(...) is not valid in a static method")
          sawSuperCall = true
          SuperE(sup, None, static = false, argList())
        } else if (isOp(".")) {
          eat()
          if (cur.kind != "id") err("expected method name after super.")
          val m = eat().text
          if (!isOp("(")) err("super properties must be called (super.m(...))")
          SuperE(sup, Some(m), superStatic, argList())
        } else err("expected super(...) or super.method(...)")
      }
      else if (isKw("new")) {
        eat()
        // `new.target` — the only legal `new.` form
        if (isOp(".")) {
          eat()
          if (cur.kind != "id" || cur.text != "target")
            err("expected 'target' after 'new.'")
          eat()
          return NewTargetE
        }
        // constructor is a member chain (`new a.b.C(x)`) — calls stay
        // out so `new f().g()` news on f, then chains on the instance.
        // The direct recursion re-enters the nesting guard: `new new …`
        // chains must not stack-overflow past it.
        exprDepth += 1
        if (exprDepth > 256)
          throw new JsException("expression nesting too deep (max 256)")
        var ctor: Expr = try primary() finally exprDepth -= 1
        var chaining = true
        while (chaining) {
          if (isOp(".")) {
            eat()
            if (cur.kind != "id") err("expected property name")
            ctor = Member(ctor, eat().text)
          } else if (isOp("[")) {
            eat(); val k = expr(); expectOp("]"); ctor = IndexE(ctor, k)
          } else chaining = false
        }
        // args optional (JS allows `new Date`); consumed HERE so the
        // postfix loop chains methods onto the instance, not the call
        NewE(ctor, if (isOp("(")) argList() else Seq.empty)
      }
      else if (cur.kind == "id") Ident(eat().text)
      else if (isOp("(")) { eat(); val e = expr(); expectOp(")"); e }
      else if (isOp("{")) {
        eat()
        val entries = mutable.ArrayBuffer.empty[(String, Expr)]
        // position of the live ACCESSOR entry per key, so a split
        // `get x(){…}, set x(v){…}` pair merges into ONE slot (the JS
        // single-accessor-property rule); a data/method entry for the
        // same key in between clears it (data replaces accessor)
        val accIdx = mutable.HashMap.empty[String, Int]
        if (!isOp("}")) {
          var more = true
          while (more) {
            val wasId = cur.kind == "id"
            val key =
              if (cur.kind == "str" || cur.kind == "id") eat().text
              else if (cur.kind == "num") eat().text
              else err("expected object key")
            // `get`/`set` are contextual (same rule as the class body):
            // accessor only when the PROPERTY name follows, so methods
            // and fields named get/set still parse
            if (wasId && (key == "get" || key == "set") &&
                (cur.kind == "id" || cur.kind == "str" || cur.kind == "num")) {
              val pName = eat().text
              val (ps, body) = funRest()
              if (key == "get" && ps.nonEmpty) err("getter takes no parameters")
              if (key == "set" && ps.size != 1)
                err("setter takes exactly one parameter")
              val lit = Some(FunLit(ps, body, pName))
              val ae =
                if (key == "get") AccessorE(lit, None) else AccessorE(None, lit)
              accIdx.get(pName) match {
                case Some(i) =>
                  val merged = (entries(i)._2, ae) match {
                    case (AccessorE(g1, s1), AccessorE(g2, s2)) =>
                      AccessorE(g2.orElse(g1), s2.orElse(s1))
                    case _ => ae
                  }
                  entries(i) = pName -> merged
                case None =>
                  accIdx(pName) = entries.length
                  entries += pName -> ae
              }
            } else if (wasId && isOp("(")) {
              // method shorthand: { m(a) { … } }
              val (ps, body) = funRest()
              accIdx.remove(key)
              entries += key -> FunLit(ps, body, key)
            } else if (wasId && (isOp(",") || isOp("}"))) {
              // property shorthand: { a, b } reads the bindings
              accIdx.remove(key)
              entries += key -> Ident(key)
            } else {
              expectOp(":")
              accIdx.remove(key)
              entries += key -> assignExpr()
            }
            if (isOp(",")) eat() else more = false
          }
        }
        expectOp("}")
        ObjLit(entries.toSeq)
      }
      else if (isOp("[")) {
        eat()
        val items = Seq.newBuilder[Expr]
        if (!isOp("]")) {
          var more = true
          while (more) { items += assignExpr(); if (isOp(",")) eat() else more = false }
        }
        expectOp("]")
        ArrLit(items.result())
      }
      else err("expected expression")
    }
  }

  def parse(src: String): Seq[Stmt] = new Parser(lex(src)).program()
}
