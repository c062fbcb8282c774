package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Python-expression translator for `eval` steps — the SURVEY §7.3
  * compatibility layer that lets the reference's shipped recipe YAML run
  * verbatim (/root/reference/conf/recipes/name.yml:5-27,
  * matching.yml:70-106; evaluated by safeeval, code/tools.py:232-246).
  *
  * This is NOT a Python interpreter. It parses the expression subset the
  * shipped recipes actually use — ternaries, arithmetic, comparisons,
  * list comprehensions, indexing/slicing, `re.sub`/`re.search`/
  * `re.compile(p).split`, `str(sep).join`, `len`/`max`/`min`/`round`,
  * the tools scalar library — and compiles it to a Catalyst `Column`
  * tree, so translated expressions run codegen'd and distributed like
  * hand-written ones. Any construct outside the subset fails AT COMPILE
  * TIME with the offending expression in the message (never silently
  * mis-evaluates).
  *
  * Plan-time type dispatch replaces Python's runtime `type()` checks:
  * `x if type(x)==list else [x]` resolves against the DataFrame schema
  * while building the plan, so only the applicable branch is planned.
  *
  * Documented divergences from CPython:
  *   - `round(x, n)` uses HALF_UP, not banker's rounding;
  *   - `set().union(a,b)` returns a DETERMINISTIC order (a's order then
  *     unseen elements of b) instead of Python's arbitrary set order;
  *   - `x[i]` out of range yields NULL (try_element_at), not IndexError
  *     (the reference turns the error into an "Ooops…" cell);
  *   - `x == ""` also matches NULL (the engine's functions signal
  *     failure with NULL where the reference uses "" — SURVEY §1.2);
  *   - `hash` is xxhash64 hex, not blake3 (ids stable within a run).
  */
object PyExpr {

  // ------------------------------------------------------------- tokens
  private sealed trait Tok
  private final case class TNum(v: Double, isInt: Boolean) extends Tok
  private final case class TStr(s: String) extends Tok
  private final case class TName(s: String) extends Tok
  private final case class TOp(s: String) extends Tok
  private case object TEnd extends Tok

  // --------------------------------------------------------------- AST
  private sealed trait Ast
  private final case class PNum(v: Double, isInt: Boolean) extends Ast
  private final case class PStr(s: String) extends Ast
  private final case class PName(n: String) extends Ast
  private case object PNone extends Ast
  private final case class PList(items: Seq[Ast]) extends Ast
  private final case class PComp(elem: Ast, v: String, src: Ast, cond: Option[Ast]) extends Ast
  private final case class PCall(fn: Ast, args: Seq[Ast]) extends Ast
  private final case class PAttr(obj: Ast, name: String) extends Ast
  private final case class PIndex(obj: Ast, idx: Ast) extends Ast
  private final case class PSliceFrom(obj: Ast, lo: Ast) extends Ast
  private final case class PBin(op: String, l: Ast, r: Ast) extends Ast
  private final case class PUn(op: String, e: Ast) extends Ast
  private final case class PTern(cond: Ast, t: Ast, f: Ast) extends Ast

  // -------------------------------------------------- lightweight types
  /** Inferred plan-time type — drives `type(x)==list`, `len`, `+`. */
  private sealed trait PT
  private final case class TArrT(elem: PT) extends PT
  private case object TStrT extends PT
  private case object TNumT extends PT
  private case object TBoolT extends PT
  private case object TUnk extends PT

  private def fromDataType(dt: DataType): PT = dt match {
    case ArrayType(e, _) => TArrT(fromDataType(e))
    case StringType      => TStrT
    case _: NumericType  => TNumT
    case BooleanType     => TBoolT
    case _               => TUnk
  }

  private final case class Ctx(schema: StructType, bound: Map[String, (Column, PT)], src: String) {
    def bind(v: String, c: Column, t: PT): Ctx = copy(bound = bound + (v -> (c, t)))
    def fail(msg: String): Nothing =
      sys.error(s"python-eval: $msg in expression <$src>")
  }

  // --------------------------------------------------------------- lexer
  private def lex(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = s.length
    def err(msg: String) =
      sys.error(s"python-eval: lex error at offset $i ($msg) in expression <$s>")
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || (c == '.' && i + 1 < n && s.charAt(i + 1).isDigit)) {
        val st = i
        while (i < n && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
        val txt = s.substring(st, i)
        // "1.2.3" would otherwise crash toDouble with an anonymous
        // NumberFormatException (found by the grammar property test)
        if (txt.count(_ == '.') > 1) err(s"malformed number '$txt'")
        out += TNum(txt.toDouble, !txt.contains('.'))
      } else if (c == 'r' && i + 1 < n && (s.charAt(i + 1) == '\'' || s.charAt(i + 1) == '"')) {
        val q = s.charAt(i + 1); i += 2; val st = i
        while (i < n && s.charAt(i) != q) i += 1
        if (i >= n) err("unterminated raw string")
        out += TStr(s.substring(st, i)); i += 1
      } else if (c.isLetter || c == '_') {
        val st = i
        while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
        out += TName(s.substring(st, i))
      } else if (c == '\'' || c == '"') {
        val q = c; i += 1; val sb = new StringBuilder
        while (i < n && s.charAt(i) != q) {
          val ch = s.charAt(i)
          if (ch == '\\' && i + 1 < n) {
            s.charAt(i + 1) match {
              case '\\' => sb.append('\\')
              case '\'' => sb.append('\'')
              case '"'  => sb.append('"')
              case 'n'  => sb.append('\n')
              case 't'  => sb.append('\t')
              case o    => sb.append('\\').append(o) // python keeps unknown escapes
            }
            i += 2
          } else { sb.append(ch); i += 1 }
        }
        if (i >= n) err("unterminated string")
        i += 1
        out += TStr(sb.toString)
      } else {
        val two = if (i + 1 < n) s.substring(i, i + 2) else ""
        if (Set("**", "==", "!=", "<=", ">=").contains(two)) { out += TOp(two); i += 2 }
        else if ("+-*/%()[],.:<>&|".indexOf(c.toInt) >= 0) { out += TOp(c.toString); i += 1 }
        else err(s"unexpected character '$c'")
      }
    }
    out += TEnd
    out.result()
  }

  // -------------------------------------------------------------- parser
  private final class Parser(toks: Vector[Tok], src: String) {
    private var p = 0
    private def peek: Tok = toks(p)
    private def advance(): Tok = { val t = toks(p); p += 1; t }
    private def fail(msg: String): Nothing =
      sys.error(s"python-eval: parse error ($msg) in expression <$src>")
    private def expectOp(op: String): Unit = advance() match {
      case TOp(`op`) => ()
      case t         => fail(s"expected '$op', got $t")
    }
    private def eatName(n: String): Boolean =
      peek match { case TName(`n`) => p += 1; true; case _ => false }

    def parseAll(): Ast = {
      val e = parseExpr()
      if (peek != TEnd) fail(s"trailing tokens from $peek")
      e
    }

    def parseExpr(): Ast = {
      val t = parseOr()
      if (eatName("if")) {
        val cond = parseOr()
        if (!eatName("else")) fail("ternary missing 'else'")
        PTern(cond, t, parseExpr())
      } else t
    }
    private def parseOr(): Ast = {
      var l = parseAnd()
      while (peek == TOp("|") || peek == TName("or")) { advance(); l = PBin("|", l, parseAnd()) }
      l
    }
    private def parseAnd(): Ast = {
      var l = parseNot()
      while (peek == TOp("&") || peek == TName("and")) { advance(); l = PBin("&", l, parseNot()) }
      l
    }
    private def parseNot(): Ast =
      if (eatName("not")) PUn("not", parseNot()) else parseCmp()
    private def parseCmp(): Ast = {
      val l = parseAdd()
      peek match {
        case TOp(op) if Set("==", "!=", "<", "<=", ">", ">=").contains(op) =>
          advance(); PBin(op, l, parseAdd())
        case TName("in") => advance(); PBin("in", l, parseAdd())
        case TName("not") =>
          advance()
          if (!eatName("in")) fail("expected 'in' after 'not'")
          PUn("not", PBin("in", l, parseAdd()))
        case _ => l
      }
    }
    private def parseAdd(): Ast = {
      var l = parseMul()
      var go = true
      while (go) peek match {
        case TOp(op @ ("+" | "-")) => advance(); l = PBin(op, l, parseMul())
        case _                     => go = false
      }
      l
    }
    private def parseMul(): Ast = {
      var l = parseUnary()
      var go = true
      while (go) peek match {
        case TOp(op @ ("*" | "/" | "%")) => advance(); l = PBin(op, l, parseUnary())
        case _                           => go = false
      }
      l
    }
    // Python grammar: u_expr ::= power | "-" u_expr ;
    //                 power  ::= primary ["**" u_expr]
    // i.e. ** binds TIGHTER than a unary minus on its left but admits one
    // on its right: -x**2 is -(x**2), 2**-1 is 0.5. Taking the base via
    // parseUnary (the old shape) read -x**2 as (-x)**2 — wrong sign for
    // every odd power of a negative.
    private def parseUnary(): Ast =
      if (peek == TOp("-")) { advance(); PUn("neg", parseUnary()) } else parsePow()
    private def parsePow(): Ast = {
      val b = parsePostfix()
      if (peek == TOp("**")) { advance(); PBin("**", b, parseUnary()) } else b
    }

    private def parsePostfix(): Ast = {
      var a = parseAtom()
      var go = true
      while (go) peek match {
        case TOp("(") =>
          advance()
          val args = scala.collection.mutable.Buffer.empty[Ast]
          if (peek != TOp(")")) {
            args += parseExpr()
            // generator expression as sole argument: f(x for v in src if c)
            // — e.g. next(s for s in names if s), matching.yml:6-7
            if (eatName("for")) {
              val v = advance() match {
                case TName(nm) => nm
                case t         => fail(s"expected loop variable, got $t")
              }
              if (!eatName("in")) fail("generator missing 'in'")
              val srcE = parseOr()
              val cond = if (eatName("if")) Some(parseExpr()) else None
              args(0) = PComp(args(0), v, srcE, cond)
            } else
              while (peek == TOp(",")) { advance(); args += parseExpr() }
          }
          expectOp(")")
          a = PCall(a, args.toSeq)
        case TOp("[") =>
          advance()
          val idx = parseExpr()
          if (peek == TOp(":")) {
            advance()
            if (peek != TOp("]")) fail("only open-ended slices x[n:] are supported")
            expectOp("]")
            a = PSliceFrom(a, idx)
          } else { expectOp("]"); a = PIndex(a, idx) }
        case TOp(".") =>
          advance()
          advance() match {
            case TName(nm) => a = PAttr(a, nm)
            case t         => fail(s"expected attribute name after '.', got $t")
          }
        case _ => go = false
      }
      a
    }

    private def parseAtom(): Ast = advance() match {
      case TNum(v, isInt) => PNum(v, isInt)
      case TStr(s)        => PStr(s)
      case TName("None")  => PNone
      case TName(n)       => PName(n)
      case TOp("(")       => val e = parseExpr(); expectOp(")"); e
      case TOp("[") =>
        if (peek == TOp("]")) { advance(); PList(Nil) }
        else {
          val first = parseExpr()
          if (eatName("for")) {
            val v = advance() match {
              case TName(nm) => nm
              case t         => fail(s"expected loop variable, got $t")
            }
            if (!eatName("in")) fail("comprehension missing 'in'")
            val srcE = parseOr() // stop before a trailing 'if <cond>'
            val cond = if (eatName("if")) Some(parseExpr()) else None
            expectOp("]")
            PComp(first, v, srcE, cond)
          } else {
            val items = scala.collection.mutable.Buffer(first)
            while (peek == TOp(",")) { advance(); items += parseExpr() }
            expectOp("]")
            PList(items.toSeq)
          }
        }
      case t => fail(s"unexpected token $t")
    }
  }

  // ---------------------------------------------------- type inference
  private def ty(a: Ast)(implicit ctx: Ctx): PT = a match {
    case PNum(_, _) => TNumT
    case PStr(_)    => TStrT
    case PNone      => TUnk
    case PName("True") | PName("False") => TBoolT
    case PName(n) =>
      ctx.bound.get(n).map(_._2)
        .orElse(ctx.schema.fields.find(_.name == n).map(f => fromDataType(f.dataType)))
        .getOrElse(TUnk)
    case PList(items)      => TArrT(items.map(ty).find(_ != TUnk).getOrElse(TUnk))
    case PComp(e, v, s, _) =>
      val elemT = ty(s) match { case TArrT(t) => t; case _ => TUnk }
      TArrT(ty(e)(ctx.bind(v, lit(null), elemT)))
    case PTern(c, t, f) =>
      planBool(c) match {
        case Some(true)  => ty(t)
        case Some(false) => ty(f)
        case None        => val tt = ty(t); if (tt == TUnk) ty(f) else tt
      }
    case PIndex(o, _) =>
      ty(o) match { case TArrT(e) => e; case TStrT => TStrT; case _ => TUnk }
    case PSliceFrom(o, _) => ty(o)
    case PBin("+", l, r) =>
      (ty(l), ty(r)) match {
        case (TStrT, _) | (_, TStrT)           => TStrT
        case (a @ TArrT(_), _)                 => a
        case (_, b @ TArrT(_))                 => b
        case _                                 => TNumT
      }
    case PBin(op, _, _) if Set("==", "!=", "<", "<=", ">", ">=", "in", "&", "|").contains(op) => TBoolT
    case PBin(_, _, _)  => TNumT
    case PUn("not", _)  => TBoolT
    case PUn(_, _)      => TNumT
    case PCall(fn, args) => callTy(fn, args)
    case PAttr(_, _)    => TUnk
  }

  private def callTy(fn: Ast, args: Seq[Ast])(implicit ctx: Ctx): PT = fn match {
    case PName("len" | "round" | "float_val" | "levenshtein_norm" | "jw" |
               "distance" | "int" | "float" | "abs") => TNumT
    case PName("str") | PName("sha1") | PName("sha256") | PName("hash") => TStrT
    case PName("max" | "min") =>
      if (args.length == 1) ty(args.head) match { case TArrT(e) => e; case _ => TNumT }
      else args.map(ty).find(t => t == TStrT).getOrElse(TNumT)
    case PName("tokenize")       => TArrT(TStrT)
    case PName("next") =>
      args.headOption.map(ty).collect { case TArrT(e) => e }.getOrElse(TUnk)
    case PName("normalize")      => ty(args.head)
    case PName("flatten") =>
      ty(args.head) match {
        case TArrT(TArrT(e)) => TArrT(e)
        case TArrT(e)        => TArrT(e)
        case t               => TArrT(t)
      }
    case PName("list")           => ty(args.head)
    case PName("filter")         => if (args.length == 2) ty(args(1)) else TUnk
    case PAttr(PName("OrderedDict"), "fromkeys") => ty(args.head)
    case PAttr(PCall(PName("set"), Seq()), "union") =>
      args.map(ty).collectFirst { case t @ TArrT(_) => t }.getOrElse(TArrT(TUnk))
    case PAttr(PName("re"), "sub")    => TStrT
    case PAttr(PName("re"), "search") => TBoolT
    case PAttr(PName("json"), "loads") => TArrT(TStrT)
    case PAttr(PCall(PAttr(PName("re"), "compile"), _), "split") => TArrT(TStrT)
    case PAttr(_, "join")    => TStrT
    case PAttr(_, "replace") => TStrT
    case _ => TUnk
  }

  /** Plan-time boolean: `type(x)==list` / `type(x)==str` resolve against
    * the schema while building the plan (Python's runtime check has no
    * Spark equivalent — a column has ONE type). */
  private def planBool(a: Ast)(implicit ctx: Ctx): Option[Boolean] = a match {
    case PBin("==", PCall(PName("type"), Seq(x)), PName(t)) => typeIs(x, t)
    case PBin("==", PName(t), PCall(PName("type"), Seq(x))) => typeIs(x, t)
    case PBin("!=", PCall(PName("type"), Seq(x)), PName(t)) => typeIs(x, t).map(!_)
    case PBin("!=", PName(t), PCall(PName("type"), Seq(x))) => typeIs(x, t).map(!_)
    // column-existence check: 'c' in row.keys() — schema knowledge, so
    // the ternary branch referencing a possibly-missing column is pruned
    // at plan-build time (location.yml:131-133)
    case PBin("in", PStr(c), PCall(PAttr(PName("row"), "keys"), Seq())) =>
      Some(ctx.schema.fieldNames.contains(c))
    case PUn("not", inner) => planBool(inner).map(!_)
    case _ => None
  }
  private def typeIs(x: Ast, t: String)(implicit ctx: Ctx): Option[Boolean] = t match {
    case "list"           => Some(ty(x).isInstanceOf[TArrT])
    case "str"            => Some(ty(x) == TStrT)
    case "int" | "float"  =>
      // the lattice's single TNumT cannot distinguish int from float —
      // answering from it would silently take the wrong ternary branch
      // (type(1.5)==int is False in python). Answer from the Spark
      // schema / literal flavor when known; otherwise None, which the
      // ternary translator escalates to a loud compile failure instead
      // of a guess.
      numFlavor(x) match {
        case Some(flavor)            => Some(flavor == t)
        case None if ty(x) == TNumT  => None
        case None if ty(x) == TUnk   => None
        case None                    => Some(false) // definitely non-numeric
      }
    case _                => None
  }

  /** int-vs-float flavor of a numeric expression, where decidable:
    * literals carry it, schema columns declare it, and the int()/float()/
    * len() builtins fix it. */
  private def numFlavor(x: Ast)(implicit ctx: Ctx): Option[String] = x match {
    case PNum(_, isInt) => Some(if (isInt) "int" else "float")
    case PName(n) =>
      import org.apache.spark.sql.types._
      ctx.schema.fields.find(_.name == n).map(_.dataType).collect {
        case ByteType | ShortType | IntegerType | LongType => "int"
        case FloatType | DoubleType                        => "float"
        case _: DecimalType                                => "float"
      }
    case PCall(PName("int"), _)              => Some("int")
    case PCall(PName("len"), _)              => Some("int")
    case PCall(PName("float"), _)            => Some("float")
    case PCall(PName("round"), args) if args.size == 1 => Some("int")
    case _ => None
  }

  // ----------------------------------------------------------- translate
  /** python `\1` group refs → java `$1`; literal `$` escaped. */
  private def pyReplToJava(r: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < r.length) {
      val c = r.charAt(i)
      if (c == '$') { sb.append("\\$"); i += 1 }
      else if (c == '\\' && i + 1 < r.length && r.charAt(i + 1).isDigit) {
        sb.append('$').append(r.charAt(i + 1)); i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def litString(a: Ast)(implicit ctx: Ctx): String = a match {
    case PStr(s)                       => s
    case PCall(PName("str"), Seq(PStr(s))) => s
    case _ => ctx.fail(s"expected a string literal, got $a")
  }

  private def tr(a: Ast)(implicit ctx: Ctx): Column = a match {
    case PNum(v, isInt) => if (isInt) lit(v.toLong) else lit(v)
    case PStr(s)        => lit(s)
    case PNone          => lit(null)
    case PName("True")  => lit(true)
    case PName("False") => lit(false)
    case PName(n) =>
      ctx.bound.get(n).map(_._1).getOrElse {
        if (ctx.schema.fieldNames.contains(n)) col(n)
        else ctx.fail(s"unknown column or name '$n' (schema: ${ctx.schema.fieldNames.mkString(", ")})")
      }
    case PList(Nil)   => array().cast("array<string>") // list([]) — typed empty
    case PList(items) => array(items.map(tr): _*)

    case PComp(elem, v, src, cond) =>
      val srcC = tr(src)
      val elemT = ty(src) match { case TArrT(e) => e; case _ => TUnk }
      def inner(x: Column): Ctx = ctx.bind(v, x, elemT)
      (elem, cond) match {
        case (PName(`v`), Some(c)) => filter(srcC, x => truthy(c)(inner(x)))
        case (_, Some(c)) =>
          transform(filter(srcC, x => truthy(c)(inner(x))), x => tr(elem)(inner(x)))
        case (_, None) => transform(srcC, x => tr(elem)(inner(x)))
      }

    case PTern(cond, t, f) =>
      planBool(cond) match {
        case Some(true)  => tr(t)
        case Some(false) => tr(f)
        case None        => when(truthy(cond), tr(t)).otherwise(tr(f))
      }

    // geopoint(x)[0]/[1] — the reference's (lat, lon) tuple fields
    // (tools.py:65-69; location.yml:131-133)
    case PIndex(PCall(PName("geopoint"), Seq(x)), PNum(i, true)) =>
      val g = Tools.geopoint(tr(x))
      if (i.toLong == 0L) g.getField("lat")
      else if (i.toLong == 1L) g.getField("lon")
      else ctx.fail(s"geopoint has fields [0]=lat, [1]=lon, got index $i")
    case PIndex(obj, idx) =>
      ty(obj) match {
        case TArrT(_) =>
          // python is 0-based from the front; NEGATIVE indices count from
          // the end, which is exactly Spark's own negative element_at
          // convention — so only non-negative indices take the +1 shift.
          // The sign branch matters even for compile-time-positive
          // expressions: x[len(x)-1] evaluates negative on empty arrays,
          // and a blind +1 would hit element_at's illegal index 0.
          // Out-of-range (either direction) → NULL (the reference turns
          // the IndexError into an "Ooops…" cell — recipes always guard
          // with a len() ternary anyway)
          val i = tr(idx).cast("int")
          try_element_at(tr(obj), when(i >= 0, i + lit(1)).otherwise(i))
        case other => ctx.fail(s"indexing requires an array column, got $other for $obj")
      }
    case PSliceFrom(obj, lo) =>
      val o = tr(obj)
      val start = tr(lo).cast("int")
      // python x[lo:]: negative lo counts from the end, clamped to the
      // whole array (x[-99:] of a 3-element array is the 3 elements)
      when(start >= 0, slice(o, start + lit(1), greatest(size(o) - start, lit(0))))
        .otherwise(when(size(o) === 0, o)
          .otherwise(slice(o, greatest(start, -size(o)), size(o))))

    case PBin("+", l, r) =>
      (ty(l), ty(r)) match {
        case (TStrT, _) | (_, TStrT)       => concat(tr(l).cast("string"), tr(r).cast("string"))
        case (TArrT(_), _) | (_, TArrT(_)) => concat(tr(l), tr(r))
        case _                             => tr(l) + tr(r)
      }
    case PBin("-", l, r)  => tr(l) - tr(r)
    case PBin("*", l, r)  => tr(l) * tr(r)
    case PBin("/", l, r)  => tr(l).cast("double") / tr(r)
    case PBin("%", l, r)  => pmod(tr(l), tr(r)) // python % is FLOORED modulo
    case PBin("**", l, r) => pow(tr(l), tr(r))
    // "" doubles as the missing marker (SURVEY §1.2): engine functions
    // return NULL where the reference returns "" — match both. On a
    // NUMERIC column only the null check applies (ANSI would reject the
    // '' cast; a number never equals "").
    case PBin("==", l, PStr("")) => emptyCheck(l)
    case PBin("==", PStr(""), r) => emptyCheck(r)
    case PBin("!=", l, PStr("")) => !emptyCheck(l)
    case PBin("!=", PStr(""), r) => !emptyCheck(r)
    case PBin("==", l, r) =>
      planBool(a).map(lit(_)).getOrElse(tr(l) === tr(r))
    case PBin("!=", l, r) =>
      planBool(a).map(lit(_)).getOrElse(tr(l) =!= tr(r))
    case PBin("<", l, r)  => tr(l) < tr(r)
    case PBin("<=", l, r) => tr(l) <= tr(r)
    case PBin(">", l, r)  => tr(l) > tr(r)
    case PBin(">=", l, r) => tr(l) >= tr(r)
    case PBin("&", l, r)  => tr(l) && tr(r)
    case PBin("|", l, r)  => tr(l) || tr(r)
    case PBin("in", l, r) =>
      ty(r) match {
        case TArrT(_) => array_contains(tr(r), tr(l))
        case TStrT    => tr(r).contains(tr(l))
        case _        => array_contains(tr(r), tr(l))
      }
    case PBin(op, _, _) => ctx.fail(s"unsupported operator '$op'")

    case PUn("not", e) => !tr(e)
    case PUn("neg", e) => -tr(e)
    case PUn(op, _)    => ctx.fail(s"unsupported unary '$op'")

    case PCall(fn, args) => trCall(fn, args)

    case PAttr(o, n) => ctx.fail(s"bare attribute access $o.$n is not supported")
  }

  private def emptyCheck(x: Ast)(implicit ctx: Ctx): Column = ty(x) match {
    case TNumT | TBoolT => tr(x).isNull
    case TArrT(_)       => tr(x).isNull || size(tr(x)) === 0
    case _              => tr(x).isNull || tr(x) === lit("")
  }

  /** Python truthiness for condition positions (`if s`, generator `if`):
    * bools stay; strings are truthy when non-null non-empty; numbers
    * when non-null non-zero; arrays when non-empty. */
  private def truthy(x: Ast)(implicit ctx: Ctx): Column = ty(x) match {
    case TBoolT   => tr(x)
    case TStrT    => tr(x).isNotNull && tr(x) =!= lit("")
    case TNumT    => tr(x).isNotNull && tr(x) =!= lit(0)
    case TArrT(_) => tr(x).isNotNull && size(tr(x)) > 0
    case TUnk     => tr(x) // already-boolean expressions (comparisons, rlike)
  }

  private def trCall(fn: Ast, args: Seq[Ast])(implicit ctx: Ctx): Column = (fn, args) match {
    // ---- core builtins
    case (PName("len"), Seq(x)) =>
      ty(x) match {
        case TArrT(_) => size(tr(x))
        case TStrT    => length(tr(x))
        case TUnk     => ctx.fail(s"cannot infer len() argument type for $x")
        case other    => ctx.fail(s"len() of a $other")
      }
    case (PName("max" | "min"), Seq(x)) =>
      ty(x) match {
        case TArrT(_) => if (fn == PName("max")) array_max(tr(x)) else array_min(tr(x))
        case _        => tr(x)
      }
    case (PName("max"), xs) if xs.length > 1 => greatest(xs.map(tr): _*)
    case (PName("min"), xs) if xs.length > 1 => least(xs.map(tr): _*)
    case (PName("round"), Seq(x)) => round(tr(x)).cast("long") // python round() → int
    case (PName("round"), Seq(x, n)) => round(tr(x), n match {
      case PNum(v, true) => v.toInt
      case other         => ctx.fail(s"round() scale must be an int literal, got $other")
    })
    case (PName("abs"), Seq(x))   => abs(tr(x))
    case (PName("str"), Seq(PStr(s))) => lit(s)
    case (PName("str"), Seq(x))   => tr(x).cast("string")
    case (PName("int"), Seq(x))   => tr(x).try_cast("long")
    case (PName("float"), Seq(x)) => tr(x).try_cast("double")
    case (PName("list"), Seq(x))  => tr(x)
    // next(gen) → first element of the generated sequence; exhausted
    // generator → NULL (the reference turns StopIteration into "Ooops…")
    case (PName("next"), Seq(x))  => try_element_at(tr(x), lit(1))
    case (PName("filter"), Seq(PNone, x)) =>
      // python filter(None, …) drops falsy values: None and ""
      filter(tr(x), e => e.isNotNull && e =!= lit(""))
    case (PName("type"), _) =>
      ctx.fail("type() is only supported inside 'type(x)==list/str' comparisons")

    // ---- tools scalar library (code/tools.py)
    case (PName("tokenize"), Seq(x)) =>
      ty(x) match {
        case TArrT(_) => flatten(transform(tr(x), e => Tools.tokenize(e)))
        case _        => Tools.tokenize(tr(x))
      }
    case (PName("normalize"), Seq(x)) =>
      ty(x) match {
        // list form drops empties (tools.py:142-155)
        case TArrT(_) =>
          filter(transform(tr(x), e => Tools.normalize(e)), e => e.isNotNull && e =!= lit(""))
        case _ => Tools.normalize(tr(x))
      }
    case (PName("flatten"), Seq(PList(items))) =>
      // mixed scalar/array elements: wrap scalars, concat everything
      // (tools.flatten recurses nested lists, scalars become [x])
      val parts = items.map { it =>
        ty(it) match {
          case TArrT(_) => tr(it)
          case _        => array(tr(it))
        }
      }
      concat(parts: _*)
    case (PName("flatten"), Seq(x)) =>
      ty(x) match {
        case TArrT(TArrT(_)) => flatten(tr(x))
        case TArrT(_)        => tr(x)
        case _               => array(tr(x))
      }
    case (PName("levenshtein_norm"), Seq(a, b)) =>
      // reference takes max over list pairs (tools.py:213-227); damerau
      // distance, matching jellyfish
      (ty(a), ty(b)) match {
        case (TArrT(_), TArrT(_)) => Similarity.levNormMax(tr(a), tr(b), "damerau")
        case (TArrT(_), _)        => Similarity.levNormMax(tr(a), array(tr(b)), "damerau")
        case (_, TArrT(_))        => Similarity.levNormMax(array(tr(a)), tr(b), "damerau")
        case _                    => Similarity.levNorm(tr(a), tr(b), "damerau")
      }
    case (PName("jw"), Seq(a, b)) =>
      (ty(a), ty(b)) match {
        case (TArrT(_), TArrT(_)) => Similarity.jwMax(tr(a), tr(b))
        case (TArrT(_), _)        => Similarity.jwMax(tr(a), array(tr(b)))
        case (_, TArrT(_))        => Similarity.jwMax(array(tr(a)), tr(b))
        case _                    => Similarity.jw(tr(a), tr(b))
      }
    case (PName("distance"), Seq(a, b)) =>
      // geodesic km between WKT geopoints, 1dp (tools.py:74-78); parse
      // failure → NULL (reference returns "")
      val ga = Tools.geopoint(tr(a)); val gb = Tools.geopoint(tr(b))
      Tools.haversineKm(ga.getField("lat"), ga.getField("lon"),
        gb.getField("lat"), gb.getField("lon"))
    case (PName("float_val"), Seq(x)) => Tools.floatVal(tr(x))
    case (PName("sha1"), Seq(x))      => Tools.sha1Hex(tr(x).cast("string"))
    case (PName("sha256"), Seq(x))    => Tools.sha256Hex(tr(x).cast("string"))
    case (PName("hash"), Seq(x))      => hex(Tools.rowHash(tr(x).cast("string")))
    case (PName("geopoint"), Seq(x))  => Tools.geopoint(tr(x))
    case (PName("ngrams"), Seq(x))    => Tools.charNgrams(tr(x), 3)

    // ---- stdlib idioms
    case (PAttr(PName("OrderedDict"), "fromkeys"), Seq(x)) =>
      array_distinct(tr(x)) // dedup preserving first occurrence
    case (PAttr(PCall(PName("set"), Seq()), "union"), xs) if xs.nonEmpty =>
      // deterministic order (first array's order, then unseen elements),
      // unlike python's arbitrary set order
      xs.map(tr).reduce(array_union)
    // json.loads over the reference's JSON-array-of-strings cells (the
    // only shape shipped recipes parse — citycode_history,
    // location.yml:133); other JSON shapes need an explicit unnest step
    case (PAttr(PName("json"), "loads"), Seq(x)) =>
      from_json(tr(x), ArrayType(StringType))
    case (PAttr(PName("re"), "sub"), Seq(p, r, s)) =>
      regexp_replace(tr(s), litString(p), pyReplToJava(litString(r)))
    case (PAttr(PName("re"), "search"), p +: s +: flagArgs) =>
      val ic = flagArgs.contains(PAttr(PName("re"), "IGNORECASE"))
      val pat = (if (ic) "(?i)" else "") + litString(p)
      tr(s).rlike(pat)
    case (PAttr(PCall(PAttr(PName("re"), "compile"), Seq(p)), "split"), Seq(x)) =>
      split(tr(x), litString(p))
    case (PAttr(sep, "join"), Seq(arr))
        if (sep match { case PStr(_) | PCall(PName("str"), Seq(PStr(_))) => true; case _ => false }) =>
      array_join(tr(arr), litString(sep))
    case (PAttr(obj, "replace"), Seq(from, to)) =>
      replace(tr(obj), tr(from).cast("string"), tr(to).cast("string"))

    case (f, as_) =>
      ctx.fail(s"unsupported function call $f(${as_.mkString(", ")}) — supported: " +
        "len max min round abs str int float list filter(None,·) tokenize normalize " +
        "flatten levenshtein_norm jw distance float_val sha1 sha256 hash geopoint " +
        "ngrams OrderedDict.fromkeys set().union re.sub re.search re.compile(p).split " +
        "'sep'.join x.replace")
  }

  // ---------------------------------------------------------- test hook
  /** Canonical re-print of an AST: fully parenthesized (every binary /
    * unary / ternary node gets its own parens), so re-parsing cannot
    * depend on precedence — the grammar property test asserts
    * parse ∘ print ∘ parse = parse over random expressions. */
  private def printAst(a: Ast): String = a match {
    case PNum(v, true)  => v.toLong.toString
    // valueOf(v).toPlainString spells the double without an exponent
    // (the lexer has no 'e' notation) and round-trips via toDouble
    case PNum(v, false) => java.math.BigDecimal.valueOf(v).toPlainString
    case PStr(s) => "'" + s.flatMap {
        case '\\' => "\\\\"
        case '\'' => "\\'"
        case '\n' => "\\n"
        case '\t' => "\\t"
        case c    => c.toString
      } + "'"
    case PName(n) => n
    case PNone    => "None"
    case PList(items) => items.map(printAst).mkString("[", ", ", "]")
    case PComp(e, v, src, cond) =>
      s"[${printAst(e)} for $v in ${printAst(src)}" +
        cond.map(c => s" if ${printAst(c)}").getOrElse("") + "]"
    case PCall(fn, args)   => s"${printAst(fn)}(${args.map(printAst).mkString(", ")})"
    // a numeric base must keep its parens: "3.4.replace" would re-lex
    // the attribute dot into the number (same ambiguity as Python)
    case PAttr(o @ PNum(_, _), n) => s"(${printAst(o)}).$n"
    case PAttr(o, n)       => s"${printAst(o)}.$n"
    case PIndex(o, i)      => s"${printAst(o)}[${printAst(i)}]"
    case PSliceFrom(o, lo) => s"${printAst(o)}[${printAst(lo)}:]"
    case PBin(op, l, r)    => s"(${printAst(l)} $op ${printAst(r)})"
    case PUn("neg", e)     => s"(-${printAst(e)})"
    case PUn(op, e)        => s"($op ${printAst(e)})"
    case PTern(c, t, f) =>
      s"(${printAst(t)} if ${printAst(c)} else ${printAst(f)})"
  }

  /** Test hook (grammar property test): parse `src`, return its
    * canonical re-print plus a structural fingerprint of the AST. */
  private[graft] def parsePrint(src: String): (String, String) = {
    val ast = new Parser(lex(src), src).parseAll()
    (printAst(ast), ast.toString)
  }

  // ------------------------------------------------------------- public
  /** Compile one Python eval expression to a Column against `schema`.
    * Fails fast (sys.error) on anything outside the supported subset. */
  def compile(exprStr: String, schema: StructType): Column = {
    val ast = new Parser(lex(exprStr), exprStr).parseAll()
    tr(ast)(Ctx(schema, Map.empty, exprStr))
  }

  /** Convert a Python re.sub replacement (`\1` group refs) to Java
    * (`$1`) — for YAML `replace` steps, whose replacements are Python
    * syntax in the reference (recipes.py:2461-2474). */
  def pyReplacement(r: String): String = pyReplToJava(r)
}
