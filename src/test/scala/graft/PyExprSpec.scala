package graft

import org.apache.spark.sql.functions._
import graft.functions.PyExpr

/** Differential property test: random expressions from PyExpr's own
  * arithmetic/boolean grammar, printed with MINIMAL parentheses (so the
  * parser's precedence and associativity are what's under test, not the
  * generator's bracketing), compiled to Columns, and compared against a
  * reference evaluator implementing Python semantics (floored %, true
  * /, ** over unary minus, lazy and/or). All sampled expressions ride
  * ONE Spark select. */
class PyExprPropertySpec extends SparkSpec {
  import graft.functions.PyExpr
  import org.apache.spark.sql.types._

  // ---- tiny AST with Python-precedence printer + reference evaluator
  private sealed trait NE { def lvl: Int }
  private case class NLit(v: Long) extends NE { val lvl = 10 }
  private case class NCol(n: String) extends NE { val lvl = 10 }
  private case class NBin(op: String, l: NE, r: NE) extends NE
    { val lvl = if (op == "+" || op == "-") 5 else 6 }
  private case class NPow(b: NE, e: Int) extends NE { val lvl = 8 }
  private case class NNeg(e: NE) extends NE { val lvl = 7 }
  private case class NTern(c: BE, t: NE, f: NE) extends NE { val lvl = 0 }
  private sealed trait BE { def lvl: Int }
  private case class BCmp(op: String, l: NE, r: NE) extends BE { val lvl = 4 }
  private case class BAnd(l: BE, r: BE) extends BE { val lvl = 2 }
  private case class BOr(l: BE, r: BE) extends BE { val lvl = 1 }
  private case class BNot(e: BE) extends BE { val lvl = 3 }

  private def pn(e: NE, min: Int): String = {
    val s = e match {
      case NLit(v) => v.toString
      case NCol(n) => n
      case NBin(op, l, r) => s"${pn(l, e.lvl)} $op ${pn(r, e.lvl + 1)}"
      // base must be primary-level (Python power ::= primary ** u_expr)
      case NPow(b, x) => s"${pn(b, 9)}**$x"
      case NNeg(x) => s"-${pn(x, 7)}"
      case NTern(c, t, f) => s"${pn(t, 1)} if ${pb(c, 1)} else ${pn(f, 0)}"
    }
    if (e.lvl < min) s"($s)" else s
  }
  private def pb(e: BE, min: Int): String = {
    val s = e match {
      case BCmp(op, l, r) => s"${pn(l, 5)} $op ${pn(r, 5)}"
      case BAnd(l, r) => s"${pb(l, 2)} and ${pb(r, 3)}"
      case BOr(l, r) => s"${pb(l, 1)} or ${pb(r, 2)}"
      case BNot(x) => s"not ${pb(x, 3)}"
    }
    if (e.lvl < min) s"($s)" else s
  }

  private def evN(e: NE, env: Map[String, Long]): Double = e match {
    case NLit(v) => v.toDouble
    case NCol(n) => env(n).toDouble
    case NBin("+", l, r) => evN(l, env) + evN(r, env)
    case NBin("-", l, r) => evN(l, env) - evN(r, env)
    case NBin("*", l, r) => evN(l, env) * evN(r, env)
    case NBin("/", l, r) => evN(l, env) / evN(r, env)
    case NBin("%", l, r) => // python floored modulo; divisors are +ve by gen
      val (a, b) = (evN(l, env), evN(r, env)); a - math.floor(a / b) * b
    case NBin(op, _, _) => sys.error(s"unexpected op $op")
    case NPow(b, x) => math.pow(evN(b, env), x)
    case NNeg(x) => -evN(x, env)
    case NTern(c, t, f) => if (evB(c, env)) evN(t, env) else evN(f, env)
  }
  private def evB(e: BE, env: Map[String, Long]): Boolean = e match {
    case BCmp("==", l, r) => evN(l, env) == evN(r, env)
    case BCmp("!=", l, r) => evN(l, env) != evN(r, env)
    case BCmp("<", l, r) => evN(l, env) < evN(r, env)
    case BCmp("<=", l, r) => evN(l, env) <= evN(r, env)
    case BCmp(">", l, r) => evN(l, env) > evN(r, env)
    case BCmp(">=", l, r) => evN(l, env) >= evN(r, env)
    case BCmp(op, _, _) => sys.error(s"unexpected cmp $op")
    case BAnd(l, r) => evB(l, env) && evB(r, env)
    case BOr(l, r) => evB(l, env) || evB(r, env)
    case BNot(x) => !evB(x, env)
  }

  // deterministic generator (seeded LCG — scalacheck Gen sizing is
  // clumsier than needed for a recursive grammar)
  private final class Rng(var s: Long) {
    def nextInt(n: Int): Int = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (math.abs(s >>> 33) % n).toInt
    }
  }
  private def genN(d: Int, r: Rng): NE =
    if (d == 0) { if (r.nextInt(2) == 0) NLit(r.nextInt(9).toLong) else NCol(if (r.nextInt(2) == 0) "x" else "y") }
    else r.nextInt(8) match {
      case 0 => NBin("+", genN(d - 1, r), genN(d - 1, r))
      case 1 => NBin("-", genN(d - 1, r), genN(d - 1, r))
      case 2 => NBin("*", genN(d - 1, r), genN(d - 1, r))
      case 3 => NBin("/", genN(d - 1, r), NLit(1 + r.nextInt(8).toLong))
      case 4 => NBin("%", genN(d - 1, r), NLit(1 + r.nextInt(8).toLong))
      case 5 => NPow(genN(d - 1, r), r.nextInt(3))
      case 6 => NNeg(genN(d - 1, r))
      case _ => NTern(genB(d - 1, r), genN(d - 1, r), genN(d - 1, r))
    }
  private def genB(d: Int, r: Rng): BE =
    if (d == 0) BCmp(Seq("==", "!=", "<", "<=", ">", ">=")(r.nextInt(6)),
      genN(0, r), genN(0, r))
    else r.nextInt(4) match {
      case 0 => BAnd(genB(d - 1, r), genB(d - 1, r))
      case 1 => BOr(genB(d - 1, r), genB(d - 1, r))
      case 2 => BNot(genB(d - 1, r))
      case _ => BCmp(Seq("==", "!=", "<", "<=", ">", ">=")(r.nextInt(6)),
        genN(d - 1, r), genN(d - 1, r))
    }

  // ---- string fragment of the grammar: concat, .replace, 'x' in s,
  // lexicographic compares, ternary — the ops recipes actually use
  private sealed trait SE { def lvl: Int }
  private case class SLit(s: String) extends SE { val lvl = 10 }
  private case class SCol(n: String) extends SE { val lvl = 10 }
  private case class SCat(l: SE, r: SE) extends SE { val lvl = 5 }
  private case class SRepl(o: SE, from: String, to: String) extends SE { val lvl = 9 }
  private case class STern(c: SB, t: SE, f: SE) extends SE { val lvl = 0 }
  private sealed trait SB
  private case class SIn(needle: String, hay: SE) extends SB
  private case class SCmp(op: String, l: SE, r: SE) extends SB

  private def ps(e: SE, min: Int): String = {
    val s = e match {
      case SLit(v) => s"'$v'"
      case SCol(n) => n
      case SCat(l, r) => s"${ps(l, 5)} + ${ps(r, 6)}"
      case SRepl(o, f, t) => s"${ps(o, 9)}.replace('$f', '$t')"
      case STern(c, t, f) => s"${ps(t, 1)} if ${psb(c)} else ${ps(f, 0)}"
    }
    if (e.lvl < min) s"($s)" else s
  }
  private def psb(b: SB): String = b match {
    case SIn(n, h) => s"'$n' in ${ps(h, 5)}"
    case SCmp(op, l, r) => s"${ps(l, 5)} $op ${ps(r, 5)}"
  }
  private def evS(e: SE, env: Map[String, String]): String = e match {
    case SLit(v) => v
    case SCol(n) => env(n)
    case SCat(l, r) => evS(l, env) + evS(r, env)
    case SRepl(o, f, t) => evS(o, env).replace(f, t)
    case STern(c, t, f) => if (evSB(c, env)) evS(t, env) else evS(f, env)
  }
  private def evSB(b: SB, env: Map[String, String]): Boolean = b match {
    case SIn(n, h) => evS(h, env).contains(n)
    case SCmp("==", l, r) => evS(l, env) == evS(r, env)
    case SCmp("!=", l, r) => evS(l, env) != evS(r, env)
    case SCmp("<", l, r) => evS(l, env) < evS(r, env)
    case SCmp("<=", l, r) => evS(l, env) <= evS(r, env)
    case SCmp(op, _, _) => sys.error(s"unexpected cmp $op")
  }
  private val frags = Seq("ab", "ba", "x", "abc", "")
  private def genS(d: Int, r: Rng): SE =
    if (d == 0) { if (r.nextInt(2) == 0) SLit(frags(r.nextInt(frags.length)))
      else SCol(if (r.nextInt(2) == 0) "s" else "t") }
    else r.nextInt(4) match {
      case 0 => SCat(genS(d - 1, r), genS(d - 1, r))
      case 1 => SRepl(genS(d - 1, r), frags(r.nextInt(4)), // non-empty from
        frags(r.nextInt(frags.length)))
      case 2 => STern(SIn(frags(r.nextInt(4)), genS(d - 1, r)),
        genS(d - 1, r), genS(d - 1, r))
      case _ => STern(SCmp(Seq("==", "!=", "<", "<=")(r.nextInt(4)),
        genS(d - 1, r), genS(d - 1, r)), genS(d - 1, r), genS(d - 1, r))
    }

  test("random STRING expressions evaluate with Python semantics (one select)") {
    import spark.implicits._
    val schema = StructType(Seq(StructField("s", StringType), StructField("t", StringType)))
    val rows = Seq(("abc", "ba"), ("", "abab"), ("xyx", "x"), ("ba", ""))
    val exprs = (1 to 120).map { i =>
      val r = new Rng(i * 104729L)
      genS(1 + r.nextInt(3), r)
    }
    val cols = exprs.zipWithIndex.map { case (e, i) =>
      PyExpr.compile(ps(e, 0), schema).as(s"c$i")
    }
    val got = rows.toDF("s", "t").select(cols: _*).collect()
    rows.zipWithIndex.foreach { case ((sv, tv), ri) =>
      val env = Map("s" -> sv, "t" -> tv)
      exprs.zipWithIndex.foreach { case (e, ci) =>
        val expect = evS(e, env)
        val actual = got(ri).getString(ci)
        assert(actual == expect,
          s"row ('$sv','$tv') expr `${ps(e, 0)}`: spark='$actual' python='$expect'")
      }
    }
  }

  test("random grammar expressions evaluate with Python semantics (one select)") {
    import spark.implicits._
    val schema = StructType(Seq(StructField("x", LongType), StructField("y", LongType)))
    val rows = Seq((3L, -4L), (-7L, 2L), (0L, 5L), (9L, 8L), (-1L, -6L))
    val exprs = (1 to 150).map { i =>
      val r = new Rng(i * 7919L)
      genN(1 + r.nextInt(3), r)
    }
    val cols = exprs.zipWithIndex.map { case (e, i) =>
      PyExpr.compile(pn(e, 0), schema).cast("double").as(s"c$i")
    }
    val got = rows.toDF("x", "y").select(cols: _*).collect()
    rows.zipWithIndex.foreach { case ((x, y), ri) =>
      val env = Map("x" -> x, "y" -> y)
      exprs.zipWithIndex.foreach { case (e, ci) =>
        val expect = evN(e, env)
        val actual = got(ri).getDouble(ci)
        assert(math.abs(actual - expect) <= math.abs(expect) * 1e-9 + 1e-9,
          s"row ($x,$y) expr `${pn(e, 0)}`: spark=$actual python=$expect")
      }
    }
  }

  // ---- FULL-grammar generator (round 8): every production the parser
  // accepts — strings, lists, comprehensions, calls, attribute access,
  // index/slice, in / not in, None, ternary — as raw source strings.
  // Unlike the differential tests above, most samples are deliberately
  // ill-TYPED ('ab' ** None, len(3)[1:], …): the properties are that
  // (1) the canonical re-print of anything that PARSES is a parse
  // fixpoint and (2) compile() either returns a Column or fails loudly
  // with the python-eval prefix — never a MatchError or a silent
  // mis-compile of a shape the translator forgot.
  private val gNames = Seq("x", "y", "s", "t", "arr", "v")
  private val gFns = Seq("len", "str", "float", "int", "list", "tokenize", "set")
  private val gStrs = Seq("ab", "x", "", "a b")
  private val gOps = Seq("+", "-", "*", "/", "%", "**",
    "==", "!=", "<", "<=", ">", ">=", "&", "|")
  private def genG(d: Int, r: Rng): String =
    if (d == 0) r.nextInt(6) match {
      case 0 | 5 => gNames(r.nextInt(gNames.length))
      case 1     => r.nextInt(100).toString
      case 2     => s"${r.nextInt(10)}.${r.nextInt(100)}"
      case 3     => s"'${gStrs(r.nextInt(gStrs.length))}'"
      case _     => "None"
    }
    else r.nextInt(13) match {
      case 0 => s"(${genG(d - 1, r)} ${gOps(r.nextInt(gOps.length))} ${genG(d - 1, r)})"
      case 1 => s"(-${genG(d - 1, r)})"
      case 2 => s"(not ${genG(d - 1, r)})"
      case 3 => s"(${genG(d - 1, r)} if ${genG(d - 1, r)} else ${genG(d - 1, r)})"
      case 4 => (0 to r.nextInt(3)).map(_ => genG(d - 1, r)).mkString("[", ", ", "]")
      case 5 => s"[${genG(d - 1, r)} for v in ${genG(d - 1, r)}]"
      case 6 => s"[${genG(d - 1, r)} for v in ${genG(d - 1, r)} if ${genG(d - 1, r)}]"
      case 7 => s"${gFns(r.nextInt(gFns.length))}(${genG(d - 1, r)})"
      // postfix bases are parenthesized: a bare numeric base would lex
      // its trailing dot into the number (42.replace → TNum(42.)), the
      // same ambiguity Python itself has
      case 8  => s"(${genG(d - 1, r)}).replace('a', 'b')"
      case 9  => s"(${genG(d - 1, r)})[${genG(d - 1, r)}]"
      case 10 => s"(${genG(d - 1, r)})[${genG(d - 1, r)}:]"
      case 11 => s"(${genG(d - 1, r)} in ${genG(d - 1, r)})"
      case _  => s"(${genG(d - 1, r)} not in ${genG(d - 1, r)})"
    }

  test("full grammar: re-print is a parse fixpoint and compile fails loudly (600 cases)") {
    val schema = StructType(Seq(
      StructField("x", LongType), StructField("y", DoubleType),
      StructField("s", StringType), StructField("t", StringType),
      StructField("arr", ArrayType(StringType))))
    var compiled = 0
    var rejected = 0
    (1 to 600).foreach { i =>
      val r = new Rng(i * 524287L)
      val src = genG(1 + r.nextInt(3), r)
      val (p1, f1) = PyExpr.parsePrint(src)
      val (p2, f2) = PyExpr.parsePrint(p1)
      assert(f2 == f1 && p2 == p1,
        s"parse∘print∘parse broke: <$src> → <$p1> → <$p2>")
      try { PyExpr.compile(src, schema); compiled += 1 }
      catch { case e: RuntimeException =>
        assert(e.getMessage != null && e.getMessage.contains("python-eval"),
          s"anonymous failure for <$src>: $e")
        rejected += 1
      }
    }
    // the generator must exercise BOTH outcomes meaningfully, or the
    // properties above are vacuous
    assert(compiled >= 100, s"only $compiled/600 samples compiled")
    assert(rejected >= 50, s"only $rejected/600 samples were rejected")
  }
}

/** The eval-expression translator (SURVEY §7.3) against the expression
  * patterns the reference's shipped recipes actually use
  * (conf/recipes/name.yml:5-27, matching.yml:70-106). */
class PyExprSpec extends SparkSpec {
  import spark.implicits._

  private def ev(df: org.apache.spark.sql.DataFrame, e: String): org.apache.spark.sql.Column =
    PyExpr.compile(e, df.schema)

  test("plan-time type dispatch: x if type(x)==list else [x] (name.yml:5)") {
    val strDf = Seq("jean").toDF("n")
    val out = strDf.select(ev(strDf, "n if (type(n)==list) else [n]").as("n"))
    assert(out.as[Seq[String]].head() == Seq("jean"))
    val arrDf = Seq(Seq("jean", "marie")).toDF("n")
    val out2 = arrDf.select(ev(arrDf, "n if (type(n)==list) else [n]").as("n"))
    assert(out2.as[Seq[String]].head() == Seq("jean", "marie"))
  }

  test("order-preserving dedup: list(OrderedDict.fromkeys(x)) (name.yml:10-11)") {
    val df = Seq(Seq("b", "a", "b", "c", "a")).toDF("x")
    val out = df.select(ev(df, "list(OrderedDict.fromkeys(x))").as("x"))
    assert(out.as[Seq[String]].head() == Seq("b", "a", "c"))
  }

  test("set union + join + tokenize chain (name.yml:14-17)") {
    val df = Seq((Seq("garcia"), Seq("jose", "maria"))).toDF("last", "first")
    val out = df
      .withColumn("norm", ev(df, "list(set().union(last,first))"))
    val out2 = out.withColumn("m", ev(out, "str(\" \").join(list(norm))"))
    val out3 = out2.withColumn("toks", ev(out2, "tokenize(m)"))
      .withColumn("n", ev(out2.withColumn("toks", lit(null).cast("array<string>")), "len(first)"))
    val r = out3.head()
    assert(r.getSeq[String](r.fieldIndex("norm")) == Seq("garcia", "jose", "maria"))
    assert(r.getAs[String]("m") == "garcia jose maria")
    assert(r.getSeq[String](r.fieldIndex("toks")) == Seq("garcia", "jose", "maria"))
    assert(r.getAs[Int]("n") == 2)
  }

  test("re.sub with raw strings and group refs (name.yml:18)") {
    // keep first two words of a composed first name, drop the rest
    val df = Seq(Seq("jean pierre marie")).toDF("first")
    val out = df.select(ev(df,
      raw"""re.sub(r'(\S\s+\S+)\s+.*',r'\1',str(first[0]))""").as("r"))
    assert(out.as[String].head() == "jean pierre")
  }

  test("guarded indexing: str(x[1]) if (len(x)>1) else \"\" (name.yml:19-21)") {
    val df = Seq((Seq("a", "b"), Seq("only"))).toDF("two", "one")
    val r1 = df.select(ev(df, "str(two[1]) if (len(two)>1) else \"\"").as("v")).as[String].head()
    val r2 = df.select(ev(df, "str(one[1]) if (len(one)>1) else \"\"").as("v")).as[String].head()
    assert(r1 == "b" && r2 == "")
  }

  test("token-overlap score: comprehension with in-filter (matching.yml:75)") {
    val df = Seq((Seq("jean", "garcia", "paris"), Seq("garcia", "jean", "lyon"))).toDF("a", "b")
    val out = df.select(ev(df,
      "round(len([x for x in a if x in b])*1.0 /max(1,min(len(a),len(b))),2)").as("s"))
    assert(math.abs(out.as[Double].head() - 0.67) < 1e-9)
  }

  test("levenshtein_norm over arrays takes the max pair (matching.yml:72)") {
    val df = Seq((Seq("garcia", "lopez"), Seq("garcia"))).toDF("a", "b")
    val out = df.select(ev(df, "max(levenshtein_norm(a,b),levenshtein_norm(a,b))").as("s"))
    assert(out.as[Double].head() == 1.0)
    // string × string
    val df2 = Seq(("dupont", "dupond")).toDF("a", "b")
    val s = df2.select(ev(df2, "levenshtein_norm(a,b)").as("s")).as[Double].head()
    assert(s > 0.8 && s < 1.0)
  }

  test("re.search ternary — date penalty (matching.yml scoring_date)") {
    val df = Seq("19850101", "19850612").toDF("d")
    val out = df.select(col("d"), ev(df,
      "round((levenshtein_norm(d,d)**2)*(0.9 if re.search('0101$',d) else 1) ,2)").as("s"))
    val m = out.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("19850101") == 0.9 && m("19850612") == 1.0)
  }

  test("float_val equality to 0/1 flag (matching.yml scoring_sex)") {
    val df = Seq(("1", "1.0"), ("1", "2"), ("x", "")).toDF("a", "b")
    val out = df.select(ev(df, "1 if (float_val(a) == float_val(b)) else 0").as("f"))
    // ("x","") → float_val is 0 on BOTH failure and "" (tools.py:25-29) → equal → 1
    assert(out.as[Long].collect().toSeq == Seq(1L, 0L, 1L))
  }

  test("empty-string guard matches NULL too (scoring_location distance)") {
    val df = Seq(Some(10.0), None).toDF("d")
    val out = df.select(ev(df, "0 if (d == \"\") else round(100*40/(40+d))/100").as("s"))
    assert(out.as[Double].collect().toSeq == Seq(0.8, 0.0))
  }

  test("flatten over split comprehension (name.yml:44)") {
    val df = Seq(Seq("jean pierre", "luc")).toDF("first")
    val out = df.select(ev(df,
      """flatten([re.compile("\s+").split(x) for x in first])""").as("r"))
    assert(out.as[Seq[String]].head() == Seq("jean", "pierre", "luc"))
  }

  test("the name_frequency composed-name expression runs end-to-end (name.yml:44)") {
    // filter(None, flatten([...])) with slice, .replace and a None branch
    val df = Seq((Seq("jean pierre", "luc"), "jean", "5.2"))
      .toDF("first", "first_first", "freq")
    val e = "flatten([re.compile(\"\\s+\").split(x) for x in first]) if (freq == \"\") " +
      "else filter(None,flatten([first_first, (first[0].replace(first_first+\" \",\"\") " +
      "if (first[0] != first_first) else None), " +
      "flatten([re.compile(\"\\s+\").split(x) for x in first[1:]])]))"
    val withFreq = df.select(ev(df, e).as("r")).as[Seq[String]].head()
    assert(withFreq == Seq("jean", "pierre", "luc"))
    val noFreq = df.withColumn("freq", lit(""))
    val flat = noFreq.select(ev(noFreq, e).as("r")).as[Seq[String]].head()
    assert(flat == Seq("jean", "pierre", "luc"))
  }

  test("string concat with + (matching.yml diff)") {
    val df = Seq((Seq("garcia"), Seq("lopez"))).toDF("a", "b")
    val out = df.select(ev(df,
      "str(\" \").join(a) +\" <> \"+str(\" \").join(b)").as("d"))
    assert(out.as[String].head() == "garcia <> lopez")
  }

  test("next() over a generator: first truthy element (matching.yml:6-7)") {
    val df = Seq(
      (Seq("", "dupont", "jean"), 1),
      (Seq("", ""), 2)).toDF("matchid_name_last", "k")
    val e = "next(s for s in matchid_name_last if s) if (type(matchid_name_last)==list) else matchid_name_last"
    val out = df.select(col("k"), ev(df, e).as("m"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out(1) == "dupont") // empties skipped
    assert(out(2) == null)     // exhausted generator → null
    // string variant takes the plan-time else branch
    val sdf = Seq("martin").toDF("matchid_name_last")
    assert(sdf.select(ev(sdf, e).as("m")).as[String].head() == "martin")
  }

  test("unsupported constructs fail at compile time with the expression in the message") {
    val df = Seq("x").toDF("c")
    val e1 = intercept[RuntimeException](ev(df, "some_unknown_fn(c)"))
    assert(e1.getMessage.contains("unsupported function") && e1.getMessage.contains("some_unknown_fn"))
    val e2 = intercept[RuntimeException](ev(df, "c @ 3"))
    assert(e2.getMessage.contains("unexpected character"))
    val e3 = intercept[RuntimeException](ev(df, "nope + 1"))
    assert(e3.getMessage.contains("unknown column"))
  }

  test("negative indices and slices follow python from-the-end semantics") {
    val arr = Seq(Seq("a", "b", "c")).toDF("xs")
    assert(arr.select(ev(arr, "xs[-1]").as("v")).as[String].head() == "c")
    assert(arr.select(ev(arr, "xs[-3]").as("v")).as[String].head() == "a")
    // out of range either direction -> NULL, python's IndexError analogue
    assert(arr.select(ev(arr, "xs[-4]").as("v")).as[String].head() == null)
    assert(arr.select(ev(arr, "xs[5]").as("v")).as[String].head() == null)
    assert(arr.select(ev(arr, "xs[-2:]").as("v")).as[Seq[String]].head()
      == Seq("b", "c"))
    assert(arr.select(ev(arr, "xs[-99:]").as("v")).as[Seq[String]].head()
      == Seq("a", "b", "c"))
    // the x[len(x)-1] idiom on an EMPTY array: the computed index is -1
    // at runtime — must yield NULL, not an illegal-index-0 crash
    val empty = Seq(Seq.empty[String]).toDF("xs")
    assert(empty.select(ev(empty, "xs[len(xs)-1]").as("v")).as[String].head() == null)
    assert(empty.select(ev(empty, "xs[-1:]").as("v")).as[Seq[String]].head()
      == Seq.empty[String])
  }

  test("type(x)==int/float dispatches on the actual column flavor, not 'any number'") {
    val dbl = Seq(1.5).toDF("x")
    // type(1.5)==int is False in python: the ternary must take the else
    // branch for a double column (the old lattice said True for any
    // numeric and silently skipped the int() conversion)
    assert(dbl.select(ev(dbl, "x if type(x)==int else int(x)").as("v"))
      .as[Double].head() == 1.0)
    val lng = Seq(7L).toDF("x")
    assert(lng.select(ev(lng, "x if type(x)==int else int(x)").as("v"))
      .as[Long].head() == 7L)
    assert(dbl.select(ev(dbl, "1 if type(x)==float else 0").as("v"))
      .as[Long].head() == 1L)
  }

  test("% is python's floored modulo, not truncated remainder") {
    val df = Seq((-7L, 12L)).toDF("a", "b")
    assert(df.select(ev(df, "a % b").as("m")).as[Long].head() == 5L)
  }

  test("distance over malformed WKT yields NULL, not an ANSI cast error") {
    val df = Seq(("POINT(2.35 48.85)", "not a point")).toDF("g1", "g2")
    val out = df.select(ev(df, "distance(g1,g2)").as("d"))
    assert(out.head().isNullAt(0))
  }
}
