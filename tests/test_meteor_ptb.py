"""Fixture tests for the METEOR 1.5 port and the PTB tokenizer port.

No JVM exists in this sandbox, so the fixtures are hand-derived from the
METEOR 1.5 algorithm (Denkowski & Lavie 2014; en task parameters
alpha=0.85, beta=0.2, gamma=0.6, delta=0.75, module weights
1.0/0.6/0.8/0.6) — closed-form values computed independently of the
implementation. Cases are chosen so the unavailable data files (WordNet
synonyms, paraphrase table, the corpus-derived function-word list) cannot
influence the result: content-only vocabulary with no synonym overlap.
"""

import math

import pytest

from gvl_tpu.eval.metrics.meteor import (FUNCTION_WORDS, Meteor, MeteorStats,
                                         align, meteor_normalize)
from gvl_tpu.eval.metrics.ptb_tokenizer import ptb_tokenize, tokenize_line

A, B, G, D = 0.85, 0.2, 0.6, 0.75


def seg(hyp, refs):
    return Meteor().score_segment(hyp, refs)[0]


class TestMeteorFixtures:
    def test_identical_content_sentence(self):
        # 3 exact matches, 1 chunk: score = (1 - 0.6*(1/3)^0.2) * 1
        expect = 1.0 - G * (1.0 / 3.0) ** B
        assert seg("dog runs fast", ["dog runs fast"]) == pytest.approx(
            expect, abs=1e-9)
        assert expect == pytest.approx(0.51835552, abs=1e-6)

    def test_disjoint_is_zero(self):
        assert seg("dog runs", ["cat sleeps"]) == 0.0

    def test_full_reordering_penalty(self):
        # all 3 match but chunks=3 -> frag=1 -> pen=gamma; P=R=Fmean=1
        assert seg("fast runs dog", ["dog runs fast"]) == pytest.approx(
            1.0 - G, abs=1e-9)

    def test_function_word_weighting(self):
        # only 'the' (function word) matches: P = R = (1-d)*1/(d+ (1-d)) = .25
        # Fmean = P (P==R); chunks=1, m=1 -> frag=1 -> pen=gamma
        assert "the" in FUNCTION_WORDS
        assert seg("the dog", ["the cat"]) == pytest.approx(
            0.25 * (1.0 - G), abs=1e-9)

    def test_stem_module_weight(self):
        # 'dog' exact (w=1), running/runs stem match (w=0.6), contiguous
        p = (1.0 + 0.6) / 2.0
        pen = G * (1.0 / 2.0) ** B
        expect = p * (1.0 - pen)  # P == R -> Fmean == P
        assert seg("dog running", ["dog runs"]) == pytest.approx(
            expect, abs=1e-9)
        assert expect == pytest.approx(0.38213538, abs=1e-6)

    def test_asymmetric_precision_recall(self):
        # hyp 'dog runs' vs ref 'dog runs fast quickly': P=1, R=0.5
        p, r = 1.0, 0.5
        fmean = p * r / (A * p + (1 - A) * r)
        pen = G * (1.0 / 2.0) ** B  # chunks=1, avg matches=2
        assert seg("dog runs", ["dog runs fast quickly"]) == pytest.approx(
            fmean * (1 - pen), abs=1e-9)

    def test_best_reference_selected(self):
        good = seg("dog runs fast", ["dog runs fast"])
        assert seg("dog runs fast",
                   ["cat sleeps", "dog runs fast", "bird flies"]) == \
            pytest.approx(good, abs=1e-12)

    def test_corpus_is_aggregate_not_mean(self):
        gts = {0: ["dog runs fast"], 1: ["cat sleeps"]}
        res = {0: ["dog runs fast"], 1: ["bird flies"]}
        corpus, per_seg = Meteor().compute_score(gts, res)
        assert per_seg[0] == pytest.approx(0.51835552, abs=1e-6)
        assert per_seg[1] == 0.0
        # aggregate stats: 3 matches/1 chunk over h_len=5, r_len=5 content
        st = MeteorStats()
        st.h_content_len = st.r_content_len = 5
        st.h_content_matches = st.r_content_matches = 3.0
        st.covered_h = st.covered_r = 3
        st.chunks = 1
        assert corpus == pytest.approx(st.score(), abs=1e-12)
        assert corpus != pytest.approx(sum(per_seg) / 2, abs=1e-3)

    def test_aggregate_closed_form(self):
        # P = R = 3/5; fmean = P; frag = 1/3
        p = 3.0 / 5.0
        pen = G * (1.0 / 3.0) ** B
        gts = {0: ["dog runs fast"], 1: ["cat sleeps"]}
        res = {0: ["dog runs fast"], 1: ["bird flies"]}
        corpus, _ = Meteor().compute_score(gts, res)
        assert corpus == pytest.approx(p * (1 - pen), abs=1e-9)

    def test_empty_hypothesis(self):
        assert seg("", ["dog runs"]) == 0.0
        corpus, per = Meteor().compute_score({0: []}, {0: ["dog"]})
        assert corpus == 0.0 and per == [0.0]


class TestAligner:
    def test_prefers_fewer_chunks_on_tie(self):
        # hyp 'a b a' vs ref 'a b': matching (0,0),(1,1) gives 1 chunk;
        # (2,0),(1,1) would give 2. Both have 2 matches.
        m = align("a b a".split(), "a b".split(), use_synonyms=False)
        assert sorted((x.i, x.j) for x in m) == [(0, 0), (1, 1)]

    def test_prefers_smaller_distance_on_full_tie(self):
        # hyp 'a a' vs ref 'a': either hyp word matches; distance prefers i=0
        m = align("a a".split(), "a".split(), use_synonyms=False)
        assert [(x.i, x.j) for x in m] == [(0, 0)]

    def test_exact_beats_stem_for_same_pair(self):
        m = align(["runs"], ["runs"], use_synonyms=False)
        assert len(m) == 1 and m[0].mod == 0

    def test_maximizes_matches_over_monotonicity(self):
        # crossing alignment still matches both words
        m = align("b a".split(), "a b".split(), use_synonyms=False)
        assert len(m) == 2


class TestMeteorNormalizer:
    def test_punct_tokenized_and_lowercased(self):
        assert meteor_normalize("A man, running.") == \
            ["a", "man", ",", "running", "."]

    def test_numbers_kept_whole(self):
        assert meteor_normalize("it costs 5.50 now") == \
            ["it", "costs", "5.50", "now"]

    def test_digit_dash_split(self):
        assert meteor_normalize("a 5-minute walk") == \
            ["a", "5", "-", "minute", "walk"]


class TestPTBTokenizer:
    def tok(self, s):
        return ptb_tokenize({0: [{"caption": s}]})[0][0]

    def test_basic_sentence(self):
        assert self.tok("A man is playing guitar.") == \
            "a man is playing guitar"

    def test_contractions(self):
        assert self.tok("He doesn't like it, but it's fine.") == \
            "he does n't like it but it 's fine"

    def test_cant_wont(self):
        assert tokenize_line("she can't won't stop") == \
            ["she", "ca", "n't", "wo", "n't", "stop"]

    def test_brackets_survive_filter(self):
        # pycocoevalcap filters the *uppercase* -LRB- against lowercased
        # tokens, so bracket escapes survive — reproduce that faithfully
        assert self.tok("The dog (a poodle) runs.") == \
            "the dog -lrb- a poodle -rrb- runs"

    def test_quotes_removed(self):
        assert self.tok('"Hello," he said.') == "hello he said"

    def test_possessives(self):
        assert self.tok("The kids' toys and the dog's bone") == \
            "the kids toys and the dog 's bone"

    def test_currency_percent_numbers(self):
        assert self.tok("It costs $5.50, 50% off.") == \
            "it costs $ 5.50 50 % off"

    def test_americanize(self):
        assert self.tok("the colour of the theatre") == \
            "the color of the theater"

    def test_assimilations(self):
        assert tokenize_line("I cannot see, he's gonna jump") == \
            ["i", "can", "not", "see", ",", "he", "'s", "gon", "na", "jump"]

    def test_abbreviations_kept(self):
        assert self.tok("Mr. Smith waves a U.S. flag") == \
            "mr. smith waves a u.s. flag"

    def test_ellipsis_and_dashes(self):
        assert self.tok("Wait... the end -- really") == "wait the end really"

    def test_multi_entry_and_plain_strings(self):
        out = ptb_tokenize({"v": ["First one.", {"caption": "Second one."}]})
        assert out["v"] == ["first one", "second one"]


class TestParaphraseModule:
    def test_paraphrase_table_match(self, tmp_path):
        from gvl_tpu.eval.metrics.meteor import (MODULE_WEIGHTS,
                                                 load_paraphrase_table)
        table = tmp_path / "para.txt"
        table.write_text("0.9 ||| sprints quickly ||| runs fast\n"
                         "0.5 ||| cat ||| feline\n"
                         "bad line without separators\n")
        t = load_paraphrase_table(str(table))
        assert t[("sprints", "quickly")] == [("runs", "fast")]

        m = Meteor(use_synonyms=False, paraphrase_table=str(table))
        # 'dog' exact + 'sprints quickly'~'runs fast' phrase (module 3)
        s, st = m.score_segment("dog sprints quickly", ["dog runs fast"])
        assert s > 0
        # covered words: 1 exact + 2/2 phrase on both sides
        assert st.covered_h == 3 and st.covered_r == 3
        # weighted matches: 1*1.0 + 2*0.6 on each side (all content words)
        assert st.h_content_matches == 1.0 + 2 * MODULE_WEIGHTS[3]
        # without the table the phrase contributes nothing
        s0, st0 = Meteor(use_synonyms=False).score_segment(
            "dog sprints quickly", ["dog runs fast"])
        assert st0.covered_h == 1
        assert s > s0

    def test_use_stem_toggle(self):
        fast = Meteor(use_synonyms=False, use_stem=False)
        s_fast, st = fast.score_segment("dog running", ["dog runs"])
        assert st.covered_h == 1  # stem module off: only 'dog' matches
        s_full, st_full = Meteor(use_synonyms=False).score_segment(
            "dog running", ["dog runs"])
        assert st_full.covered_h == 2
        # on token-id strings the two configurations are identical
        a, _ = fast.score_segment("5 6 7", ["5 7 9"])
        b, _ = Meteor(use_synonyms=False).score_segment("5 6 7", ["5 7 9"])
        assert a == b

    def test_default_function_words_override(self, tmp_path):
        """default_function_words swaps the process default (the hook the
        dumped jar list installs through) and restores on exit;
        load_function_words reads a one-word-per-line dump."""
        from gvl_tpu.eval.metrics.meteor import (default_function_words,
                                                 load_function_words)
        hyp, refs = "the dog runs in the park", ["a dog runs in a park"]
        base, st = Meteor(use_synonyms=False).score_segment(hyp, refs)
        assert st.h_function_len > 0          # 'the'/'in' are function words
        with default_function_words(frozenset()):
            none, st0 = Meteor(use_synonyms=False).score_segment(hyp, refs)
            assert st0.h_function_len == 0
        assert none != base
        # restored after the with-block
        again, _ = Meteor(use_synonyms=False).score_segment(hyp, refs)
        assert again == base

        p = tmp_path / "en.words"
        p.write_text("the\nin\n\n")
        words = load_function_words(str(p))
        assert words == frozenset({"the", "in"})
        filed, stf = Meteor(use_synonyms=False,
                            function_words=words).score_segment(hyp, refs)
        assert stf.h_function_len == 3        # the, in, the


class TestAlignerOptimality:
    """Property test: on short strings the beam-40 aligner attains the
    exhaustive optimum of Meteor's (coverage desc, chunks asc, distance asc)
    objective."""

    @staticmethod
    def objective(matches):
        matches = sorted(matches, key=lambda m: m.i)
        cov = sum(m.li + m.lj for m in matches)
        chunks, last = 0, None
        for m in matches:
            if last != (m.i, m.j):
                chunks += 1
            last = (m.i + m.li, m.j + m.lj)
        dist = sum(abs(m.i - m.j) for m in matches)
        return (-cov, chunks, dist)

    @classmethod
    def brute_force(cls, cands):
        best = (0, 0, 0)
        best_obj = cls.objective([])

        def rec(idx, used_h, used_r, chosen):
            nonlocal best_obj
            if idx == len(cands):
                obj = cls.objective(chosen)
                if obj < best_obj:
                    best_obj = obj
                return
            rec(idx + 1, used_h, used_r, chosen)
            m = cands[idx]
            if m.i not in used_h and m.j not in used_r:
                rec(idx + 1, used_h | {m.i}, used_r | {m.j}, chosen + [m])

        rec(0, set(), set(), [])
        return best_obj

    def test_beam_matches_exhaustive(self):
        import random

        from gvl_tpu.eval.metrics.meteor import _enumerate_matches, align
        rng = random.Random(0)
        alphabet = ["a", "b", "c"]
        for _ in range(60):
            hyp = [rng.choice(alphabet) for _ in range(rng.randint(1, 6))]
            ref = [rng.choice(alphabet) for _ in range(rng.randint(1, 6))]
            cands = _enumerate_matches(hyp, ref, False, None, use_stem=False)
            got = self.objective(align(hyp, ref, use_synonyms=False,
                                       use_stem=False))
            want = self.brute_force(cands)
            assert got == want, (hyp, ref, got, want)
