from scratchpad_tpu.memory.page_allocator import PageAllocator, ReqSlotAllocator
from scratchpad_tpu.memory.kv_cache import KVCacheConfig, create_kv_cache
from scratchpad_tpu.memory.radix_cache import RadixCache, MatchResult
from scratchpad_tpu.memory.chunk_cache import ChunkCache

__all__ = [
    "PageAllocator",
    "ReqSlotAllocator",
    "KVCacheConfig",
    "create_kv_cache",
    "RadixCache",
    "MatchResult",
    "ChunkCache",
]
