#!/usr/bin/env python3
"""Randomized differential for the complex-prefix-code reader: craft
streams whose literal code is a random Kraft-complete length array
serialized with random explicit/16-run/17-run choices, emit every present
symbol once in canonical-code order, and compare (a) the reference
decoder's output and (b) the Scala decoder's output against (c) the
modeled canonical order. Any divergence pinpoints a length-reading or
canonical-assignment bug. Writes the fixture corpus for BrotliSpec's
tree-fuzz test when invoked with `emit`."""
import sys, random, importlib.util

spec = importlib.util.spec_from_file_location("bg", "tools/brotli_gen.py")
bg = importlib.util.module_from_spec(spec)
_argv = sys.argv
sys.argv = ["bg", "none"]
spec.loader.exec_module(bg)
sys.argv = _argv
import brotlicffi


def random_lengths(rng, alphabet=256):
    """Random Kraft-complete sym->len (1..15) over a clustered subset."""
    nclusters = rng.randint(1, 4)
    syms = set()
    while len(syms) < 2:
        syms = set()
        for _ in range(nclusters):
            start = rng.randrange(alphabet)
            width = rng.randint(1, 80)
            for s in range(start, min(alphabet, start + width)):
                if rng.random() < 0.8:
                    syms.add(s)
    syms = sorted(syms)

    lens = {}
    def split(group, depth):
        if len(group) == 1:
            lens[group[0]] = max(1, depth)
            return
        # both halves must fit in remaining depth 15
        cap = 1 << (15 - depth - 1)
        lo = max(1, len(group) - cap)
        hi = min(len(group) - 1, cap)
        k = rng.randint(lo, hi)
        split(group[:k], depth + 1)
        split(group[k:], depth + 1)
    shuffled = syms[:]
    rng.shuffle(shuffled)
    split(shuffled, 0)
    assert abs(sum(2.0 ** -l for l in lens.values()) - 1.0) < 1e-12
    return lens


def serialize_complex(w, lens, alphabet, rng):
    """Emit a complex prefix code for sym->len using random run choices."""
    # ---- CL code over used length values + 0 + 16 + 17
    used = sorted(set(lens.values()))
    cl_syms = sorted(set(used) | {0, 16, 17})
    k = len(cl_syms)
    L = max(1, (k - 1).bit_length())
    m = (1 << L) - k  # symbols at depth L-1
    cl_lens = {}
    order = cl_syms[:]
    rng.shuffle(order)
    for i, s in enumerate(order):
        cl_lens[s] = (L - 1) if i < m else L
    assert all(1 <= l <= 5 for l in cl_lens.values()), cl_lens
    w.w(0, 2)  # HSKIP 0
    space = 0
    for sym in bg.CL_ORDER:
        l = cl_lens.get(sym, 0)
        pat, nb = bg.CLCL[l]
        w.w(pat, nb)
        if l:
            space += 32 >> l
        if space >= 32:
            break
    assert space == 32
    cl_codes = bg._canonical(cl_lens)

    def emit_cl(sym):
        pat, nb = cl_codes[sym]
        for i in range(nb):
            w.w((pat >> (nb - 1 - i)) & 1, 1)

    # ---- symbol lengths with random explicit/run choices
    arr = [lens.get(s, 0) for s in range(alphabet)]
    # trailing zeros are implicit (space completion ends the read)
    last_nz = max(i for i, l in enumerate(arr) if l)
    i = 0
    prev_len = 8
    while i <= last_nz:
        l = arr[i]
        run = 1
        while i + run <= last_nz and arr[i + run] == l:
            run += 1
        if l == 0 and run >= 3 and rng.random() < 0.9:
            emitted = emit_run(w, emit_cl, rng, 17, 3, run)
        elif l != 0 and l == prev_len and run >= 3 and rng.random() < 0.7:
            emitted = emit_run(w, emit_cl, rng, 16, 2, run)
        else:
            emitted = 0
        rest = run - emitted
        for _ in range(rest):
            emit_cl(l)
            if l != 0:
                prev_len = l
        if emitted and l != 0:
            prev_len = l
        i += run


def emit_run(w, emit_cl, rng, code, eb, target):
    """Emit a 16/17 chain covering UP TO target repetitions; returns the
    cumulative count emitted (caller tops up explicitly). Chain rule:
    r1 = 3+e, r' = ((r-2)<<eb) + 3 + e."""
    if target < 3:
        return 0
    emax = (1 << eb) - 1
    e1 = rng.randint(0, min(emax, target - 3))
    emit_cl(code)
    w.w(e1, eb)
    r = 3 + e1
    while True:
        base = ((r - 2) << eb) + 3
        if base > target or rng.random() < 0.3:
            return r
        e = rng.randint(0, min(emax, target - base))
        emit_cl(code)
        w.w(e, eb)
        r = base + e


def _insert_code(length):
    base = [0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34, 50, 66, 98, 130, 194,
            322, 578, 1090, 2114, 6210, 22594]
    extra = [0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9, 10,
             12, 14, 24]
    for c in range(23, -1, -1):
        if base[c] <= length:
            return c, length - base[c], extra[c]
    raise ValueError(length)


def craft(seed):
    rng = random.Random(seed)
    lens = random_lengths(rng)
    order = sorted(lens, key=lambda s: (lens[s], s))
    n = len(order)
    w = bg.W()
    bg.wbits_header(w)
    bg.mlen_header(w, n, islast=True)
    for _ in range(3):
        w.w(0, 1)
    w.w(0, 2); w.w(0, 4); w.w(0, 2); w.w(0, 1); w.w(0, 1)
    serialize_complex(w, lens, 256, rng)
    # command: one insert-only command covering all n literals
    ic, iextra, ibits = _insert_code(n)
    # cell with explicit dist & insert range containing ic: cells 2..10
    cells = {0: (2, 2), 8: (4, 5), 16: (7, 9)}
    for ibase, (cell, _alt) in cells.items():
        if ibase <= ic < ibase + 8:
            sym = (cell << 6) | ((ic - ibase) << 3) | 0
            break
    bg.simple_code(w, [sym], 704)
    bg.simple_code(w, [0], 64)
    w.w(iextra, ibits)
    codes = bg._canonical(lens)
    for s in order:
        pat, nb = codes[s]
        for i in range(nb):
            w.w((pat >> (nb - 1 - i)) & 1, 1)
    return w.bytes(), bytes(order)


def main():
    cmd = _argv[1] if len(_argv) > 1 else "check"
    trials = int(_argv[2]) if len(_argv) > 2 else 300
    bad = 0
    out_dir = "src/test/resources/brotli_trees"
    if cmd == "emit":
        import os
        os.makedirs(out_dir, exist_ok=True)
    for seed in range(trials):
        s, expect = craft(seed)
        try:
            got = brotlicffi.decompress(s)
        except Exception as e:
            print(f"seed {seed}: reference REJECTED: {e}")
            bad += 1
            continue
        if got != expect:
            print(f"seed {seed}: canonical mismatch vs reference")
            print("  expect:", expect[:40])
            print("  got   :", got[:40])
            bad += 1
        elif cmd == "emit":
            with open(f"{out_dir}/t{seed}.br", "wb") as f:
                f.write(s)
            with open(f"{out_dir}/t{seed}.raw", "wb") as f:
                f.write(expect)
    print(f"{trials - bad} ok, {bad} bad")


if __name__ == "__main__":
    main()
