// Native prompt-lookup proposer: rightmost trailing-n-gram match.
//
// Host-side counterpart of flashattn_tpu.serving.engine._ngram_propose —
// the only O(context) Python work on the decode critical path when
// prompt-lookup speculation is on (one scan per active slot per wave; at
// 32K-token contexts and full batches the Python loop costs milliseconds,
// comparable to a relay dispatch).  Exposed extern "C" for ctypes, the
// same binding style as the data loader (and as the reference's CUDA
// launchers, minitorch/cuda_kernel_ops.py:26-29).
//
// Semantics are IDENTICAL to the Python fallback (tests fuzz the two
// against each other): for n = max_ngram..1, find the rightmost s with
// ctx[s:s+n] == ctx[len-n:] and s <= len-n-1, and return up to k tokens
// ctx[s+n : s+n+k].  Build: see native/Makefile.

#include <cstdint>

extern "C" {

// Writes at most k proposed token ids into out; returns the count (0 when
// the context has no repeated trailing n-gram).
int32_t ngram_propose(const int32_t* ctx, int64_t len, int32_t k,
                      int32_t max_ngram, int32_t* out) {
  if (len <= 1 || k <= 0) return 0;
  for (int32_t n = max_ngram; n >= 1; --n) {
    if (len <= n) continue;
    const int32_t* pat = ctx + (len - n);
    for (int64_t s = len - n - 1; s >= 0; --s) {
      bool match = true;
      for (int32_t t = 0; t < n; ++t) {
        if (ctx[s + t] != pat[t]) { match = false; break; }
      }
      if (!match) continue;
      // s <= len-n-1 guarantees at least one continuation token
      int64_t start = s + n;
      int32_t cnt = 0;
      for (; cnt < k && start + cnt < len; ++cnt) out[cnt] = ctx[start + cnt];
      return cnt;
    }
  }
  return 0;
}

}  // extern "C"
