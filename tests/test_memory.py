import numpy as np
import pytest

from scratchpad_tpu.memory import PageAllocator, ReqSlotAllocator, RadixCache


class TestPageAllocator:
    def test_alloc_free_roundtrip(self):
        a = PageAllocator(num_pages=8, page_size=16)
        assert a.available_pages == 8
        p1 = a.alloc(3)
        assert p1 is not None and len(p1) == 3
        assert a.available_pages == 5
        p2 = a.alloc(5)
        assert a.available_pages == 0
        assert a.alloc(1) is None
        a.free(p1)
        a.free(p2)
        assert a.available_pages == 8
        # no duplicate pages were ever handed out
        assert len(set(p1.tolist()) | set(p2.tolist())) == 8

    def test_free_group_defers(self):
        a = PageAllocator(4, 16)
        p = a.alloc(2)
        a.free_group_begin()
        a.free(p)
        assert a.available_pages == 2  # not yet returned
        a.free_group_end()
        assert a.available_pages == 4

    def test_backup_restore(self):
        a = PageAllocator(4, 16)
        state = a.backup_state()
        a.alloc(3)
        a.restore_state(state)
        assert a.available_pages == 4


class TestReqSlotAllocator:
    def test_slots(self):
        r = ReqSlotAllocator(max_reqs=2, max_pages_per_req=4)
        s1, s2 = r.alloc(), r.alloc()
        assert {s1, s2} == {0, 1}
        assert r.alloc() is None
        r.write_pages(s1, 0, np.array([5, 6], dtype=np.int32))
        assert r.page_table[s1, 0] == 5 and r.page_table[s1, 1] == 6
        r.free(s1)
        assert r.page_table[s1].sum() == 0
        assert r.alloc() == s1


def _toks(n, start=0):
    return list(range(start, start + n))


class TestRadixCache:
    PS = 4

    def test_miss_then_hit(self):
        c = RadixCache(page_size=self.PS)
        m = c.match_prefix(_toks(8))
        assert m.num_pages == 0
        dup = c.insert(_toks(8), np.array([10, 11], np.int32))
        assert dup == 0
        m = c.match_prefix(_toks(8))
        assert m.num_pages == 2
        np.testing.assert_array_equal(m.page_ids, [10, 11])

    def test_page_alignment(self):
        c = RadixCache(page_size=self.PS)
        c.insert(_toks(8), np.array([1, 2], np.int32))
        # 7 tokens only covers 1 whole page
        m = c.match_prefix(_toks(7))
        assert m.num_pages == 1

    def test_partial_match_splits(self):
        c = RadixCache(page_size=self.PS)
        c.insert(_toks(12), np.array([1, 2, 3], np.int32))
        # shares first 2 pages, diverges at page 3
        other = _toks(8) + [99, 98, 97, 96]
        m = c.match_prefix(other)
        assert m.num_pages == 2
        dup = c.insert(other, np.array([4, 5, 6], np.int32))
        assert dup == 2  # caller's first two pages are duplicates
        # both full paths now resolvable
        np.testing.assert_array_equal(c.match_prefix(_toks(12)).page_ids, [1, 2, 3])
        np.testing.assert_array_equal(c.match_prefix(other).page_ids, [1, 2, 6])

    def test_insert_dedup_full(self):
        c = RadixCache(page_size=self.PS)
        c.insert(_toks(8), np.array([1, 2], np.int32))
        dup = c.insert(_toks(8), np.array([7, 8], np.int32))
        assert dup == 2
        np.testing.assert_array_equal(c.match_prefix(_toks(8)).page_ids, [1, 2])

    def test_lock_protects_from_eviction(self):
        c = RadixCache(page_size=self.PS)
        c.insert(_toks(8), np.array([1, 2], np.int32))
        m = c.match_prefix(_toks(8))
        c.inc_lock_ref(m.last_node)
        assert c.protected_pages == 2 and c.evictable_pages == 0
        freed = []
        n = c.evict(10, lambda ids: freed.extend(ids.tolist()))
        assert n == 0 and freed == []
        c.dec_lock_ref(m.last_node)
        assert c.evictable_pages == 2
        n = c.evict(10, lambda ids: freed.extend(ids.tolist()))
        assert n == 2 and sorted(freed) == [1, 2]
        assert c.match_prefix(_toks(8)).num_pages == 0

    def test_evict_lru_order(self):
        c = RadixCache(page_size=self.PS)
        a = _toks(4)
        b = [50, 51, 52, 53]
        c.insert(a, np.array([1], np.int32))
        c.insert(b, np.array([2], np.int32))
        c.match_prefix(b)  # touch b -> a is LRU
        freed = []
        c.evict(1, lambda ids: freed.extend(ids.tolist()))
        assert freed == [1]
        assert c.match_prefix(b).num_pages == 1

    def test_evict_promotes_parent_leaf(self):
        c = RadixCache(page_size=self.PS)
        c.insert(_toks(8), np.array([1, 2], np.int32))
        other = _toks(4) + [99, 98, 97, 96]
        c.insert(other, np.array([1, 3], np.int32))
        freed = []
        n = c.evict(3, lambda ids: freed.extend(ids.tolist()))
        assert n == 3 and sorted(freed) == [1, 2, 3]

    def test_deep_chain_and_accounting(self):
        c = RadixCache(page_size=self.PS)
        rng = np.random.default_rng(0)
        seqs = []
        next_page = [0]

        def fresh_pages(n):
            out = np.arange(next_page[0], next_page[0] + n, dtype=np.int32)
            next_page[0] += n
            return out

        for _ in range(20):
            length = int(rng.integers(1, 10)) * self.PS
            if seqs and rng.random() < 0.5:
                base = seqs[int(rng.integers(len(seqs)))]
                cut = (int(rng.integers(0, len(base) // self.PS)) ) * self.PS
                seq = base[:cut] + [int(x) for x in rng.integers(1000, 2000, length)]
            else:
                seq = [int(x) for x in rng.integers(1000, 2000, length)]
            m = c.match_prefix(seq)
            pages = np.concatenate(
                [m.page_ids, fresh_pages(len(seq) // self.PS - m.num_pages)]
            )
            dup = c.insert(seq, pages)
            assert dup >= m.num_pages  # at least previously matched is dup
            seqs.append(seq)
            # every inserted seq still fully matchable
            got = c.match_prefix(seq)
            assert got.num_pages == len(seq) // self.PS


class TestHostKVTier:
    def _engine(self, host_tokens):
        from scratchpad_tpu.config import ServerArgs
        from scratchpad_tpu.server.engine import Engine

        return Engine(
            ServerArgs(
                preset="tiny-debug",
                random_weights=True,
                dtype="float32",
                page_size=4,
                max_total_tokens=256,  # 64 pages: small enough to evict
                host_kv_cache_tokens=host_tokens,
            )
        )

    def test_evicted_prefix_promotes_back(self):
        from scratchpad_tpu.sampling.sampling_params import SamplingParams

        rng = np.random.default_rng(0)
        eng = self._engine(4096)
        sp = SamplingParams(temperature=0.0, max_new_tokens=4, ignore_eos=True)
        pa = rng.integers(1, 500, 96).tolist()
        first = eng.generate(input_ids=pa, sampling_params=sp)

        # force eviction of pa's pages with other long prompts
        for seed in range(3):
            filler = np.random.default_rng(10 + seed).integers(1, 500, 96)
            eng.generate(input_ids=filler.tolist(), sampling_params=sp)
        tier = eng.scheduler.host_tier
        assert tier.stored_pages > 0  # something offloaded to host

        again = eng.generate(input_ids=pa, sampling_params=sp)
        assert tier.restored_pages > 0  # host pages promoted back
        assert again.cached_tokens > 0  # admission saw the restored prefix
        assert again.output_ids == first.output_ids
        eng.scheduler.check_memory_leak()

    def test_disabled_tier_unchanged(self):
        from scratchpad_tpu.sampling.sampling_params import SamplingParams

        eng = self._engine(0)
        assert eng.scheduler.host_tier is None
        sp = SamplingParams(temperature=0.0, max_new_tokens=4, ignore_eos=True)
        out = eng.generate(
            input_ids=list(range(1, 40)), sampling_params=sp
        )
        assert len(out.output_ids) == 4
        eng.scheduler.check_memory_leak()

    def test_tier_with_pipelined_windows(self):
        """Host tier + depth-2 decode-window pipeline (VERDICT r4 weak 8):
        eviction/promotion may interleave with an in-flight queued window —
        outputs must match the unpipelined engine exactly and the pages
        must still promote back."""
        from scratchpad_tpu.config import ServerArgs
        from scratchpad_tpu.server.engine import Engine
        from scratchpad_tpu.sampling.sampling_params import SamplingParams

        eng = Engine(
            ServerArgs(
                preset="tiny-debug",
                random_weights=True,
                dtype="float32",
                page_size=4,
                max_total_tokens=256,
                host_kv_cache_tokens=4096,
                enable_overlap=True,  # auto keeps it off on CPU
                decode_pipeline_depth=2,
            )
        )
        rng = np.random.default_rng(0)
        sp = SamplingParams(temperature=0.0, max_new_tokens=6, ignore_eos=True)
        pa = rng.integers(1, 500, 96).tolist()
        first = eng.generate(input_ids=pa, sampling_params=sp)
        for seed in range(3):
            filler = np.random.default_rng(10 + seed).integers(1, 500, 96)
            eng.generate(input_ids=filler.tolist(), sampling_params=sp)
        tier = eng.scheduler.host_tier
        assert tier.stored_pages > 0
        again = eng.generate(input_ids=pa, sampling_params=sp)
        assert tier.restored_pages > 0
        assert again.output_ids == first.output_ids
        # cross-check vs the plain engine (depth 1, no tier interplay)
        ref = self._engine(4096).generate(input_ids=pa, sampling_params=sp)
        assert first.output_ids == ref.output_ids[: len(first.output_ids)]
        eng.scheduler.check_memory_leak()


def test_param_offload_multinode_raises():
    """Config-5 planning constraint (SCALING_70B.md): param offload cannot
    combine with DCN meshes — the resolve() guard must say so up front
    instead of failing mid-boot (VERDICT r4 weak 8 / item 9)."""
    from scratchpad_tpu.config import ServerArgs

    with pytest.raises(ValueError, match="param offload"):
        ServerArgs(
            preset="tiny-debug",
            num_nodes=2,
            node_rank=0,
            dist_init_addr="127.0.0.1:45000",
            enable_param_offload=True,
        ).resolve()
