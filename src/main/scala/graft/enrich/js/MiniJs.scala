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
  * temp), and arrow functions (`x => x + 1`, `(a, b) => { … }`,
  * desugared to function literals — no `this` exists here, so the
  * distinction collapses to syntax), and `new` over the BUILT-IN
  * constructors (`Date` with an injectable UTC clock, the `Error`
  * family, `RegExp`, `Array`, `Object`). Numbers keep integral
  * identity (Long) until an operation
  * forces a double — so ids survive a get/set round-trip, which
  * pure-double JS semantics would corrupt.
  * Still out of scope: user prototypes (`new` on a script function),
  * generators, `async`, destructuring in function parameters or bare
  * assignments.
  */
object MiniJs {

  final class JsException(msg: String) extends RuntimeException(msg)
  final class SandboxViolation(msg: String) extends RuntimeException(msg)

  /** Host object exposed to scripts: method-call surface only (no
    * reflection, no field access). */
  trait HostObject extends Serializable {
    def invoke(method: String, args: Seq[Any]): Any
  }

  // ---------- values ----------
  // Any is one of: null, java.lang.Boolean, java.lang.Long,
  // java.lang.Double, String, mutable.LinkedHashMap[String, Any] (object),
  // mutable.ArrayBuffer[Any] (array), Closure, HostObject, Undefined

  case object Undefined { override def toString = "undefined" }

  final case class Closure(params: Seq[String], body: Seq[Stmt], env: Env,
      name: String)

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
  final case class FunLit(params: Seq[String], body: Seq[Stmt], name: String) extends Expr
  final case class Member(target: Expr, name: String) extends Expr
  final case class IndexE(target: Expr, key: Expr) extends Expr
  final case class Call(target: Expr, args: Seq[Expr]) extends Expr
  final case class Unary(op: String, e: Expr) extends Expr
  final case class Bin(op: String, l: Expr, r: Expr) extends Expr
  final case class CondE(c: Expr, t: Expr, f: Expr) extends Expr
  final case class Assign(target: Expr, op: String, value: Expr) extends Expr
  /** `/pattern/flags` — compiled (and cached) by the evaluator. */
  final case class RegexL(pattern: String, flags: String) extends Expr
  /** `new Ctor(args)` — a closed set of BUILT-IN constructors (Date,
    * Error family, RegExp, Array, Object); user prototypes stay out of
    * scope. */
  final case class NewE(ctor: String, args: Seq[Expr]) extends Expr

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
            i += 1
            sb.append(src.charAt(i) match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case other => other // covers \` \$ \\ and plain chars
            })
            i += 1
          } else if (ch == '`') { closed = true; i += 1 }
          else if (ch == '$' && i + 1 < n && src.charAt(i + 1) == '{') {
            segs += sb.toString; sb.clear(); sb.append('S')
            i += 2
            val es = new StringBuilder
            var depth = 1
            var quote: Char = 0
            while (i < n && depth > 0) {
              val ec = src.charAt(i)
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
            i += 1
            sb.append(src.charAt(i) match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case other => other
            })
          } else sb.append(ch)
          i += 1
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

    private def varDecl(): Stmt = {
      val entries = Seq.newBuilder[(String, Option[Expr])]
      var more = true
      while (more) {
        if (isOp("{") || isOp("[")) {
          // destructuring declaration, desugared to member/index reads
          // off a once-evaluated temp: var {a, b: c, d = 1} = RHS →
          // var __$destrN = RHS, a = __$destrN.a, c = __$destrN.b,
          // d = (__$destrN.d === undefined ? 1 : __$destrN.d)
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
              binds += target -> (tmp =>
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
              binds += name -> (tmp =>
                withDefault(IndexE(tmp, NumL(i.toLong)), default))
              idx += 1
              if (isOp(",")) eat() else go = false
            }
            expectOp("]")
          }
          if (!isOp("=")) err("destructuring declaration needs an initializer")
          eat()
          val tmpName = destrTmp()
          entries += tmpName -> Some(expr())
          binds.result().foreach { case (name, mk) =>
            entries += name -> Some(mk(Ident(tmpName)))
          }
        } else {
          if (cur.kind != "id") err("expected variable name")
          val name = eat().text
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
      val name = eat().text
      val (ps, body) = funRest()
      FunDecl(name, ps, body)
    }

    private def funRest(): (Seq[String], Seq[Stmt]) = {
      expectOp("(")
      val ps = Seq.newBuilder[String]
      if (!isOp(")")) {
        var more = true
        while (more) {
          if (cur.kind != "id") err("expected parameter name")
          ps += eat().text
          if (isOp(",")) eat() else more = false
        }
      }
      expectOp(")")
      expectOp("{")
      val body = Seq.newBuilder[Stmt]
      while (!isOp("}")) body += statement()
      expectOp("}")
      (ps.result(), body.result())
    }

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
            val name = eat().text
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
        val name = eat().text
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
      * body is an implicit return. (No `this` exists in this engine, so
      * the arrow/function distinction collapses to syntax.) */
    private def arrowFun(): Expr = {
      val ps = Seq.newBuilder[String]
      if (cur.kind == "id") ps += eat().text
      else {
        expectOp("(")
        if (!isOp(")")) {
          var more = true
          while (more) {
            if (cur.kind != "id") err("expected arrow parameter name")
            ps += eat().text
            if (isOp(",")) eat() else more = false
          }
        }
        expectOp(")")
      }
      expectOp("=>")
      val body =
        if (isOp("{")) block() match {
          case Block(stmts) => stmts
          case other => Seq(other)
        }
        else Seq(ReturnS(Some(expr())))
      FunLit(ps.result(), body, "")
    }

    private def assignExpr(): Expr = {
      if (arrowAhead()) return arrowFun()
      val lhs = condExpr()
      if (cur.kind == "op" && Set("=", "+=", "-=", "*=", "/=", "%=").contains(cur.text)) {
        lhs match {
          case _: Ident | _: Member | _: IndexE =>
            val op = eat().text
            Assign(lhs, op, assignExpr())
          case _ => err("invalid assignment target")
        }
      } else lhs
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
      while (cur.kind == "op" && Set("<", "<=", ">", ">=").contains(cur.text)) {
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
          eat()
          val args = Seq.newBuilder[Expr]
          if (!isOp(")")) {
            var more = true
            while (more) { args += assignExpr(); if (isOp(",")) eat() else more = false }
          }
          expectOp(")")
          e = Call(e, args.result())
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
      else if (isKw("new")) {
        eat()
        if (cur.kind != "id") err("expected constructor name after new")
        val ctor = eat().text
        // args optional (JS allows `new Date`); consumed HERE so the
        // postfix loop chains methods onto the instance, not the call
        val args = Seq.newBuilder[Expr]
        if (isOp("(")) {
          eat()
          if (!isOp(")")) {
            var more = true
            while (more) { args += assignExpr(); if (isOp(",")) eat() else more = false }
          }
          expectOp(")")
        }
        NewE(ctor, args.result())
      }
      else if (cur.kind == "id") Ident(eat().text)
      else if (isOp("(")) { eat(); val e = expr(); expectOp(")"); e }
      else if (isOp("{")) {
        eat()
        val entries = Seq.newBuilder[(String, Expr)]
        if (!isOp("}")) {
          var more = true
          while (more) {
            val key =
              if (cur.kind == "str" || cur.kind == "id") eat().text
              else if (cur.kind == "num") eat().text
              else err("expected object key")
            expectOp(":")
            entries += key -> assignExpr()
            if (isOp(",")) eat() else more = false
          }
        }
        expectOp("}")
        ObjLit(entries.result())
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
