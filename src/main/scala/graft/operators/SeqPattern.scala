package graft.operators

/** MATCH_RECOGNIZE-lite: compile a row-pattern over event CLASSES into
  * the engine-portable transition tables the keyed-recursion family
  * executes (the t29 funnel generalized from one hand-written table to
  * a COMPILED operator — Flink-CEP/ISO row-pattern territory expressed
  * as a per-key executor fold).
  *
  * Pattern grammar (v1, validated at compile):
  *   pattern  := elem (' ' elem)*
  *   elem     := CLASS quant?          CLASS = one [A-Z] symbol
  *   quant    := '+' | '?'             (exactly-one when absent)
  * The LAST element must not be optional (greedy quantifiers with a
  * trailing '?' need lookahead a single-pass fold cannot do).
  *
  * Semantics (deterministic, both engines execute the same table):
  * scan each key's rows in order; a match COMPLETES on the row that
  * satisfies the last element (AFTER MATCH SKIP PAST LAST ROW — the
  * match counter increments and the scan restarts at state 0 on the
  * NEXT row); on a row that fits no transition, the scan restarts AT
  * THAT ROW (it may begin a new match: class == first element → state
  * 1, else state 0). This is the skip-to-next CEP strategy, not full
  * backtracking — overlapping matches and mid-pattern re-entry (KMP
  * failure functions over quantified elements) are out of scope and
  * documented as such.
  *
  * DFA construction: state s = number of pattern elements fully
  * committed (0..n−1; completing element n emits and resets). Reading
  * class c at state s:
  *   1. if s ≥ 1 and element s is '+' and c == class(s): stay (absorb);
  *   2. else advance: the first element j > s with class(j) == c and
  *      every element strictly between s and j optional ('?') — j == n
  *      emits a match (next state 0), else next state j;
  *   3. else restart: c == class(1) behaves as rule 2 from state 0
  *      (n == 1 emits immediately), anything else → state 0.
  *
  * The compiled table renders as ONE `CASE` tree, generated twice from
  * the same rows with different variable spellings — Spark's
  * `aggregate` lambda (acc.st / e.cls) and the oracle's recursive CTE
  * (s.st / e.cls) — so both engines execute the identical decision
  * tree and integer parity is by construction. */
object SeqPattern {

  final case class Elem(cls: Char, quant: Char) // quant: '1' | '+' | '?'

  /** (state, class) → (next state, emits-match). Only classes the
    * pattern names appear; any other class is the implicit
    * restart-to-0 default. */
  final case class Compiled(elems: Seq[Elem],
      rows: Seq[((Int, Char), (Int, Boolean))],
      restarts: Set[(Int, Char)] = Set.empty) {
    def classes: Seq[Char] = elems.map(_.cls).distinct

    private lazy val lookup = rows.toMap

    /** The Scala twin of the rendered CASE — same `rows`, so the
      * streaming state processor and the batch fold execute the
      * identical table by construction. */
    def step(st: Int, cls: Char): (Int, Boolean) =
      lookup.getOrElse((st, cls), (0, false))

    /** Rule-3 membership rendered as a 0/1 CASE over `st`/`cls`
      * variable spellings — the SQL twin of [[isRestart]], for folds
      * that must re-base a WITHIN clock engine-portably. */
    def restartCase(st: String, cls: String): String = {
      val whens = restarts.toSeq.sorted.map { case (s0, c) =>
        s"WHEN $st = $s0 AND $cls = '$c' THEN 1" }
      if (whens.isEmpty) "0"
      else s"CASE ${whens.mkString(" ")} ELSE 0 END"
    }

    /** True when (st, cls) resolves through rule 3 — the row could
      * not continue the open partial and instead BEGINS a new one
      * (or falls to state 0). The streaming WITHIN clock needs this:
      * a rule-3 transition to state 1 and an absorb at state 1 are
      * indistinguishable from (state, next) alone, but only the
      * former re-bases the partial's start time at the current row. */
    def isRestart(st: Int, cls: Char): Boolean = restarts((st, cls))

    /** The next-state CASE over `st`/`cls` variable spellings; both
      * engines get the same tree, one textual form each. */
    def nextStateCase(st: String, cls: String): String =
      caseTree(st, cls, { case (next, _) => next.toString })

    /** The match-increment CASE (1 on emitting transitions, else 0). */
    def emitCase(st: String, cls: String): String =
      caseTree(st, cls, { case (_, emits) => if (emits) "1" else "0" })

    private def caseTree(st: String, cls: String,
        render: ((Int, Boolean)) => String): String = {
      val whens = rows.map { case ((s, c), out) =>
        s"WHEN $st = $s AND $cls = '$c' THEN ${render(out)}"
      }
      val dflt = render((0, false))
      s"CASE ${whens.mkString(" ")} ELSE $dflt END"
    }
  }

  def compile(pattern: String): Compiled = {
    val elems = parse(pattern)
    val n = elems.length
    require(elems.last.quant != '?',
      s"the last pattern element must not be optional: '$pattern'")
    // a trailing '+' needs the same lookahead a trailing '?' does: the
    // emitting transition resets to state 0, so greedy absorption can
    // never fire and the element would silently behave as exactly-one
    // (over-counting matches vs the documented greedy semantics)
    require(elems.last.quant != '+',
      s"the last pattern element must not be '+' (greedy trailing " +
        s"quantifiers need lookahead a single-pass fold cannot do): " +
        s"'$pattern'")
    // shadow rules, both rejected at compile instead of silently
    // mis-matching: (a) a greedy '+' followed (through optionals) by
    // the SAME class can never advance — absorb always wins; (b) an
    // optional element whose class reappears before (or at) the next
    // required element GREEDILY commits the row to the optional slot,
    // missing matches only lookahead could recover ("A? A" over one A
    // must match, but the fold takes the A as the optional and ends
    // mid-pattern).
    elems.zipWithIndex.foreach { case (e, i) =>
      if (e.quant == '+' || e.quant == '?') {
        var j = i + 1
        var blocked = true
        while (j < n && blocked) {
          require(elems(j).cls != e.cls,
            s"'${e.cls}${e.quant}' shadowed by the later " +
              s"'${elems(j).cls}' element (greedy commitment would " +
              s"mis-match): '$pattern'")
          blocked = elems(j).quant == '?'
          j += 1
        }
      }
    }
    val classes = elems.map(_.cls).distinct
    // rule 2/3 core: from committed-count `s`, what does class c do?
    def advance(s: Int, c: Char): Option[(Int, Boolean)] = {
      var j = s + 1
      while (j <= n) {
        if (elems(j - 1).cls == c) return Some((j, j == n))
        if (elems(j - 1).quant != '?') return None
        j += 1
      }
      None
    }
    val built = for {
      s <- 0 until n
      c <- classes
    } yield {
      val absorb =
        if (s >= 1 && elems(s - 1).quant == '+' && elems(s - 1).cls == c)
          Some((s, false)) else None
      val adv = absorb.orElse(advance(s, c))
      // rule 3 applies only when the row cannot continue the open
      // partial — recorded so the streaming WITHIN clock can re-base
      // the partial's start at this row
      val viaRestart = s > 0 && adv.isEmpty
      val out0 = adv.orElse(advance(0, c)).getOrElse((0, false))
      // normalize: an emitting transition's NEXT state is always 0
      // (AFTER MATCH SKIP PAST LAST ROW) — the table is the public
      // contract, so it states that directly
      val out = (if (out0._2) 0 else out0._1, out0._2)
      ((s, c), out, viaRestart)
    }
    Compiled(elems,
      // drop rows equal to the implicit default (state 0, no emit) —
      // the CASE stays small and the default arm covers them
      built.collect { case (k, out, _) if out != ((0, false)) => (k, out) },
      built.collect { case (k, _, r) if r => k }.toSet)
  }

  private def parse(pattern: String): Seq[Elem] = {
    val toks = pattern.trim.split("\\s+").toSeq
    require(toks.nonEmpty && toks.head.nonEmpty, "empty pattern")
    toks.map { t =>
      require(t.length <= 2 && t.head.isUpper,
        s"pattern element must be CLASS[+?]: '$t'")
      val q = if (t.length == 2) t(1) else '1'
      require(q == '1' || q == '+' || q == '?',
        s"unknown quantifier in '$t'")
      Elem(t.head, q)
    }
  }
}
