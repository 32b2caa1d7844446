"""EBNF (GBNF subset) -> regex DFA compilation + e2e guided decoding."""

import pytest

from scratchpad_tpu.constrained.ebnf import ebnf_to_regex
from scratchpad_tpu.constrained.regex_fsm import compile_regex


def accepts(src, s, max_depth=None):
    dfa = compile_regex(ebnf_to_regex(src, max_depth=max_depth))
    st = dfa.walk(dfa.initial, s)
    return st >= 0 and dfa.is_accepting(st)


class TestEbnfToRegex:
    def test_literal_alternation(self):
        g = 'root ::= "yes" | "no"'
        assert accepts(g, "yes") and accepts(g, "no")
        assert not accepts(g, "maybe") and not accepts(g, "ye")

    def test_rule_refs_and_repetition(self):
        g = """
        # a comment
        root ::= word ("," ws word)*
        word ::= [a-z]+
        ws   ::= [ \t]*
        """
        assert accepts(g, "a")
        assert accepts(g, "abc, def,ghi")
        assert not accepts(g, "abc,")
        assert not accepts(g, "ABC")

    def test_literal_escapes_and_metachars(self):
        g = 'root ::= "a.b(c)*" "\\n"?'
        assert accepts(g, "a.b(c)*")
        assert accepts(g, "a.b(c)*\n")
        assert not accepts(g, "aXb(c)*")

    def test_bounded_repetition(self):
        g = "root ::= [0-9]{2,4}"
        assert accepts(g, "12") and accepts(g, "1234")
        assert not accepts(g, "1") and not accepts(g, "12345")

    def test_optional_and_plus(self):
        g = 'root ::= "-"? [0-9]+'
        assert accepts(g, "-12") and accepts(g, "7")
        assert not accepts(g, "-") and not accepts(g, "")

    def test_nested_groups(self):
        g = 'root ::= ("a" | "b" ("c" | "d"))+'
        for s in ("a", "bc", "bd", "abcbd"):
            assert accepts(g, s), s
        assert not accepts(g, "b")

    def test_recursion_unrolls_bounded(self):
        g = 'root ::= "(" root ")" | "x"'
        # depth 3: up to 2 nesting levels around the base case survive
        for s in ("x", "(x)", "((x))"):
            assert accepts(g, s, max_depth=3), s
        assert not accepts(g, "(((x)))", max_depth=3)
        assert not accepts(g, "((x)", max_depth=3)
        # strict mode keeps the old clear error
        with pytest.raises(ValueError, match="recursive"):
            ebnf_to_regex(g, max_depth=0)

    def test_indirect_recursion_unrolls(self):
        g = """
        root ::= a
        a ::= "x" b
        b ::= a | "y"
        """
        # a -> x b -> x a | x y: strings are x^n y
        for s in ("xy", "xxy", "xxxy"):
            assert accepts(g, s), s
        assert not accepts(g, "x")

    def test_recursive_list_with_star(self):
        """Self-reference under * becomes empty at the bound, not a failure."""
        g = """
        root ::= item ("," item)*
        item ::= "[" root "]" | [0-9]+
        """
        for s in ("1", "1,2", "[1,2]", "[1],[2,3]", "[[1]]"):
            assert accepts(g, s), s
        assert not accepts(g, "[1,")

    def test_recursion_without_base_case(self):
        with pytest.raises(ValueError, match="base case"):
            ebnf_to_regex('root ::= "(" root ")"')

    def test_undefined_rule(self):
        with pytest.raises(ValueError, match="not defined"):
            ebnf_to_regex('root ::= missing "x"')

    def test_missing_root(self):
        with pytest.raises(ValueError, match="no 'root'"):
            ebnf_to_regex('start ::= "x"')


class TestEbnfE2E:
    def test_guided_generation(self):
        from tests.test_constrained import CharTokenizer
        from scratchpad_tpu.config import ServerArgs
        from scratchpad_tpu.sampling.sampling_params import SamplingParams
        from scratchpad_tpu.server.engine import Engine

        eng = Engine(
            ServerArgs(
                preset="tiny-debug",
                random_weights=True,
                dtype="float32",
                page_size=4,
                max_total_tokens=2048,
            ),
            tokenizer=CharTokenizer(),
        )
        sp = SamplingParams(
            temperature=0.0,
            max_new_tokens=16,
            ebnf='root ::= answer "!"\nanswer ::= "yes" | "no" | "maybe"',
        )
        out = eng.generate(prompt="q: ok? a:", sampling_params=sp)
        assert out.text in ("yes!", "no!", "maybe!"), out.text
        eng.scheduler.check_memory_leak()


class TestRecursivePDA:
    """Truly recursive grammars run EXACTLY on the pushdown engine
    (constrained/pda.py) instead of the DFA's bounded unroll."""

    NESTED = (
        'root ::= value\n'
        'value ::= "x" | "(" value ")"\n'
    )

    def test_pda_selected_for_recursive_grammar(self):
        from scratchpad_tpu.constrained.pda import (
            CompiledPDAGrammar,
            is_recursive,
        )

        assert is_recursive(self.NESTED)
        assert not is_recursive('root ::= "a" | "b"')

    def test_deep_nesting_beyond_unroll_bound(self):
        """15-level nesting: deeper than any DFA unroll depth the engine
        would pick; the PDA accepts it exactly."""
        from scratchpad_tpu.constrained.pda import PDA

        p = PDA(self.NESTED)
        deep = "(" * 15 + "x" + ")" * 15
        c = p.walk(p.initial_configs(), deep)
        assert c is not None and p.accepts(c)
        assert p.walk(p.initial_configs(), "(" * 15 + "x" + ")" * 14 + "]") is None

    def test_left_recursion_rejected(self):
        from scratchpad_tpu.constrained.pda import PDA
        import pytest as _pytest

        with _pytest.raises(ValueError, match="left-recursive|depth"):
            PDA('root ::= root "x" | "y"')

    def test_guided_generation_recursive(self):
        from tests.test_constrained import CharTokenizer
        from scratchpad_tpu.config import ServerArgs
        from scratchpad_tpu.sampling.sampling_params import SamplingParams
        from scratchpad_tpu.server.engine import Engine
        from scratchpad_tpu.constrained.pda import PDA

        eng = Engine(
            ServerArgs(
                preset="tiny-debug",
                random_weights=True,
                dtype="float32",
                page_size=4,
                max_total_tokens=2048,
            ),
            tokenizer=CharTokenizer(),
        )
        sp = SamplingParams(
            temperature=0.0,
            max_new_tokens=24,
            ebnf=self.NESTED,
        )
        out = eng.generate(prompt="draw: ", sampling_params=sp)
        p = PDA(self.NESTED)
        c = p.walk(p.initial_configs(), out.text)
        assert c is not None and p.accepts(c), out.text
        eng.scheduler.check_memory_leak()

    def test_native_walker_matches_python(self):
        """csrc/pda.cpp mask fill == the Python config-set walk."""
        import numpy as np
        from scratchpad_tpu.constrained.pda import CompiledPDAGrammar

        src = (
            'root ::= value\n'
            'value ::= "null" | [0-9]+ | array\n'
            'array ::= "[" (value ("," value)*)? "]"\n'
        )
        rng = np.random.default_rng(0)
        chars = list('0123456789[],nul x')
        toks = [
            "".join(rng.choice(chars, rng.integers(1, 5))) for _ in range(512)
        ]
        toks[0] = None
        toks[1] = ""
        cg = CompiledPDAGrammar(src, toks, {2})
        assert cg._native is not None, "g++ pda kernel failed to build"
        native = cg._native
        configs = cg.pda.initial_configs()
        for step in range(6):
            cg._native = native
            cg._mask_cache.clear()
            m_native, _ = cg.mask_and_dsts(configs)
            cg._native = None
            cg._mask_cache.clear()
            m_py, dst = cg.mask_and_dsts(configs)
            np.testing.assert_array_equal(m_native, m_py, err_msg=str(step))
            if not dst:
                break
            pick = next(
                (t for t in sorted(dst) if toks[t] in ("[", "1")),
                sorted(dst)[0],
            )
            configs = dst[pick]

    def test_adaptive_ci_masks_match_exact(self):
        """Context-independent classification + native subset re-walks
        produce the same masks as the exact Python path across a nested
        walk (xgrammar's adaptive-token-mask analogue)."""
        import numpy as np
        from scratchpad_tpu.constrained.pda import CompiledPDAGrammar

        src = (
            'root ::= value\n'
            'value ::= "null" | [0-9]+ | array\n'
            'array ::= "[" (value ("," value)*)? "]"\n'
        )
        rng = np.random.default_rng(2)
        chars = list("0123456789[],nul")
        toks = [
            "".join(rng.choice(chars, rng.integers(1, 5))) for _ in range(512)
        ]
        toks[0] = None
        cg = CompiledPDAGrammar(src, toks, {1})
        assert cg._native_classify is not None
        configs = cg.pda.initial_configs()
        for step in range(12):
            cg._mask_cache.clear()
            m_ci, _ = cg.mask_and_dsts(configs)
            native, cg._native = cg._native, None
            cg._mask_cache.clear()
            m_py, dst = cg.mask_and_dsts(configs)
            cg._native = native
            np.testing.assert_array_equal(m_ci, m_py, err_msg=str(step))
            if not dst:
                break
            pick = next(
                (t for t in sorted(dst) if toks[t] in ("[", "]", "1")),
                sorted(dst)[0],
            )
            configs = dst[pick]


class TestLeftRecursionExact:
    """Paull elimination makes left-recursive EBNF exact on the PDA
    (reference capability: xgrammar handles these natively)."""

    SRC = (
        'root ::= expr\n'
        'expr ::= expr "+" term | term\n'
        'term ::= term "*" factor | factor\n'
        'factor ::= [0-9] | "(" expr ")"\n'
    )

    def _machine(self, src):
        from scratchpad_tpu.constrained.leftrec import (
            eliminate_left_recursion,
        )
        from scratchpad_tpu.constrained.pda import PDA

        return PDA(eliminate_left_recursion(src))

    def _accepts(self, p, s):
        cfg = p.walk(p.initial_configs(), s)
        return cfg is not None and any(
            st in p.rules[r].accepting and f is None for r, st, f in cfg
        )

    def test_deep_chain_past_unroll_bound(self):
        p = self._machine(self.SRC)
        deep = "+".join("1" for _ in range(80))  # depth 80 > any unroll
        assert self._accepts(p, deep)
        assert self._accepts(p, "1+2*3+(4+5)*6")
        for bad in ("1++2", "+1", "1+", "(1+2"):
            assert not self._accepts(p, bad), bad

    def test_indirect_cycle(self):
        src = (
            'root ::= a\n'
            'a ::= b "x" | "z"\n'
            'b ::= a "y" | "w"\n'
        )
        p = self._machine(src)
        for good in ("z", "wx", "zyx", "wxyx", "zyxyx"):
            assert self._accepts(p, good), good
        for bad in ("zy", "x", "w", "zx"):
            assert not self._accepts(p, bad), bad

    def test_nullable_prefix_left_recursion(self):
        src = 'root ::= root "a" | "b"? "c"\n'
        p = self._machine(src)
        for good in ("c", "bc", "ca", "bcaaa"):
            assert self._accepts(p, good), good
        for bad in ("a", "b", "cb"):
            assert not self._accepts(p, bad), bad

    def test_backend_routes_left_recursive_to_pda(self):
        import numpy as np
        from scratchpad_tpu.constrained.backend import GrammarBackend
        from scratchpad_tpu.constrained.pda import PDAGrammar

        class _Tok:
            eos_token_id = 0

            def get_vocab(self):
                raise AttributeError

            def decode(self, ids, **kw):
                return "".join(chr(i - 1) for i in ids if 0 < i <= 256)

        be = GrammarBackend(_Tok(), vocab_size=257)
        g = be.get_grammar("ebnf", self.SRC)
        assert isinstance(g, PDAGrammar), type(g)
        # drive a depth-30 left chain through token masks
        text = "+".join("7" for _ in range(30))
        V = 257
        for ch in text:
            mask = np.zeros(-(-V // 32), np.uint32)
            g.fill_vocab_bitmask(mask, V)
            tid = ord(ch) + 1
            assert (mask[tid // 32] >> (tid % 32)) & 1, ch
            g.accept_token(tid)
        mask = np.zeros(-(-V // 32), np.uint32)
        g.fill_vocab_bitmask(mask, V)
        assert mask[0] & 1  # eos allowed at a complete expression
