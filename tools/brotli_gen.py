#!/usr/bin/env python3
"""Hand-crafted RFC 7932 (brotli) stream generator + table derivation.

Two jobs, both validated through the REFERENCE decoder (brotlicffi):

1. derive-transforms: craft minimal streams that reference each static-
   dictionary word transform id 0..120 and read off (prefix, op, suffix)
   from the reference decoder's output. The result IS the public RFC 7932
   section-8 transform table, recovered behaviorally so no table is
   copied from any implementation.

2. derive-context: craft one stream per context mode whose output is a
   sequence of (p2, p1, ctx) triples for every (p1, p2) byte pair: block
   type 0 writes two arbitrary bytes through a flat 8-bit literal code,
   block type 1 reads one literal through a 64-tree context map where
   tree k is a single-symbol code emitting byte k — so the decoder's own
   context computation is what picks the emitted byte. Recovers the
   UTF8/Signed (and trivially LSB6/MSB6) context lookup tables.

3. fixtures: deterministic (raw, compressed) pairs across quality levels
   and window sizes for the Scala decoder's differential spec.

Everything here writes only to the repo / /tmp; the dictionary blob is
extracted from the local libbrotlicommon and verified against RFC 7932's
published SHA-256 before use.
"""
import hashlib, os, sys, json

sys.path.insert(0, "/root/miniconda/lib/python3.13/site-packages")
import brotlicffi

DICT_SHA256 = "20e42eb1b511c21806d4d227d07e5dd06877d8ce7b3a817f378f313653f35c70"
DICT_LEN = 122784
NDBITS = [0,0,0,0,10,10,11,11,10,10,10,10,10,9,9,8,7,7,8,7,7,6,6,5,5]
DOFFSET = [0]*4 + [0]
for l in range(4, 24):
    DOFFSET.append(DOFFSET[-1] + (1 << NDBITS[l]) * l)
# DOFFSET[4..24]; DOFFSET[4]=0 ... end 122784


def load_dict():
    data = open("/root/miniconda/lib/libbrotlicommon.so.1.2.0", "rb").read()
    i = data.find(b"timedown")
    blob = data[i:i + DICT_LEN]
    assert hashlib.sha256(blob).hexdigest() == DICT_SHA256, "dictionary hash mismatch"
    return blob


class W:
    def __init__(self):
        self.bits = []

    def w(self, v, n):
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def bytes(self):
        bb = bytearray()
        bits = self.bits + [0] * ((-len(self.bits)) % 8)
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b |= bits[i + j] << j
            bb.append(b)
        return bytes(bb)


def wbits_header(w, wb=22):
    if wb == 16:
        w.w(0, 1)
    else:
        w.w(1, 1); w.w(wb - 17, 3)
        assert 18 <= wb <= 24


def mlen_header(w, mlen, islast=True):
    w.w(1 if islast else 0, 1)
    if islast:
        w.w(0, 1)  # not empty
    if mlen <= 1 << 16:
        w.w(0, 2); w.w(mlen - 1, 16)
    elif mlen <= 1 << 20:
        w.w(1, 2); w.w(mlen - 1, 20)
    else:
        w.w(2, 2); w.w(mlen - 1, 24)
    if not islast:
        w.w(0, 1)  # ISUNCOMPRESSED = 0


def uncompressed_block(w, payload):
    # non-last metablock, ISUNCOMPRESSED=1, align, raw bytes
    w.w(0, 1)  # not last
    m = len(payload)
    assert 1 <= m <= 1 << 16
    w.w(0, 2); w.w(m - 1, 16)
    w.w(1, 1)  # uncompressed
    while len(w.bits) % 8:
        w.w(0, 1)
    for b in payload:
        w.w(b, 8)


def simple_code(w, symbols, alphabet, tree_select=0):
    bits = max(1, (alphabet - 1).bit_length())
    w.w(1, 2)  # simple marker
    w.w(len(symbols) - 1, 2)
    for s in symbols:
        w.w(s, bits)
    if len(symbols) == 4:
        w.w(tree_select, 1)


# fixed code for code-length-code lengths: value -> (bitpattern, nbits),
# bits emitted LSB-first
CLCL = {0: (0b00, 2), 1: (0b0111, 4), 2: (0b011, 3), 3: (0b10, 2),
        4: (0b01, 2), 5: (0b1111, 4)}
CL_ORDER = [1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def complex_code(w, lengths, alphabet):
    """Emit a complex prefix code for the given symbol->length map (dict),
    writing every symbol's length explicitly (no 16/17 runs except we do
    use literal zeros). Kraft must sum to exactly 1."""
    used = sorted(set(lengths.values()) - {0})
    assert sum(2 ** -l for s, l in lengths.items() if l) == 1.0
    # code-length code: all used lengths get CL length 1 if <=2 distinct,
    # else a flat-ish assignment
    if len(used) == 1:
        # need a complete CL code: give the used length CL len 1 and pair
        # it with an unused length symbol also at len 1 (never emitted
        # ... but space must close, so we must emit only the used one;
        # pick partner 0 (zero-length marker) which IS emitted for gaps)
        cl_lens = {used[0]: 1, 0: 1}
    elif len(used) == 2:
        cl_lens = {used[0]: 1, used[1]: 2, 0: 2} if 0 in _gaps(lengths, alphabet) else {used[0]: 1, used[1]: 1}
    else:
        raise NotImplementedError("generator only needs <=2 distinct lengths")
    # if there are gap symbols (length 0) ensure 0 has a CL code
    if _gaps(lengths, alphabet) and 0 not in cl_lens:
        # redistribute: used lengths at 2,2 (if two) or 1; zero at 1
        if len(used) == 1:
            cl_lens = {used[0]: 1, 0: 1}
        else:
            cl_lens = {0: 1, used[0]: 2, used[1]: 2}
    # check CL kraft
    assert abs(sum(2 ** -l for l in cl_lens.values()) - 1.0) < 1e-9, cl_lens
    w.w(0, 2)  # HSKIP = 0 (complex)
    space = 0
    emitted = {}
    for sym in CL_ORDER:
        l = cl_lens.get(sym, 0)
        pat, n = CLCL[l]
        w.w(pat, n)
        emitted[sym] = l
        if l:
            space += 32 >> l
        if space >= 32:
            break
    assert space == 32, (space, cl_lens)
    # canonical CL code assignment: shorter first, then symbol order
    cl_codes = _canonical(cl_lens)
    # emit each symbol's length in symbol order
    for s in range(alphabet):
        l = lengths.get(s, 0)
        pat, n = cl_codes[l]
        for i in range(n):
            w.w((pat >> (n - 1 - i)) & 1, 1)  # MSB-first within a prefix code


def _gaps(lengths, alphabet):
    return [s for s in range(alphabet) if lengths.get(s, 0) == 0]


def _canonical(lens_by_symbol):
    """symbol->len map to symbol->(code, len) canonical (RFC: shorter
    codes first, same-length by symbol order, MSB-first)."""
    out = {}
    code = 0
    last_len = 0
    for s, l in sorted(((s, l) for s, l in lens_by_symbol.items() if l),
                       key=lambda x: (x[1], x[0])):
        code <<= (l - last_len)
        out[s] = (code, l)
        code += 1
        last_len = l
    return out


def dist_code_for(D, npostfix=0, ndirect=0):
    """Return (symbol, extra_value, extra_bits) encoding distance D."""
    for nbits in range(1, 25):
        for h in (0, 1):
            offset = ((2 + h) << nbits) - 4
            lo = ((offset + 0) << npostfix) + 0 + ndirect + 1
            hi = ((offset + (1 << nbits) - 1) << npostfix) + ((1 << npostfix) - 1) + ndirect + 1
            if lo <= D <= hi:
                # npostfix=0 path only (what we use)
                extra = D - 1 - ndirect - offset
                if 0 <= extra < (1 << nbits):
                    sym = 16 + ndirect + ((nbits - 1) << 1) + h
                    return sym, extra, nbits
    raise ValueError(D)


def craft_dict_ref(length, index, tid, mlen_out):
    """Stream: [10 filler literals if length needs copy codes 8..15] then
    one dictionary reference (word `index` of `length`, transform `tid`).
    mlen_out = expected total output length."""
    w = W()
    wbits_header(w)
    filler = 0 if 2 <= length - 2 <= 7 else 10
    mlen_header(w, filler + mlen_out, islast=True)
    # block info: 1 block type per category
    for _ in range(3):
        w.w(0, 1)  # NBLTYPES=1
    w.w(0, 2)  # NPOSTFIX
    w.w(0, 4)  # NDIRECT>>NPOSTFIX
    w.w(0, 2)  # context mode for the single literal block type (LSB6)
    w.w(0, 1)  # NTREESL = 1
    w.w(0, 1)  # NTREESD = 1
    # literal code: single symbol 'x'
    simple_code(w, [ord('x')], 256)
    # command code: single symbol
    if filler == 0:
        sym = (2 << 6) | (0 << 3) | (length - 2)  # insert 0, copy len
        ins_extra = (0, 0)
        cp_extra = (0, 0)
    else:
        # cell 5: insert codes 8..15 (base idx 8), copy codes 8..15
        # (empirically probed against brotlicffi: cells 0..10 map to
        # (ins, copy, implicit-dist) = (0,0,T)(0,8,T)(0,0,F)(0,8,F)
        # (8,0,F)(8,8,F)(0,16,F)(16,0,F)(8,16,F)(16,8,F)(16,16,F))
        # insert len 10 = code 8 (base 10, 2 extra), extra 0
        cc, ce, cn = _copy_code(length)
        assert 8 <= cc <= 15, (length, cc)
        sym = (5 << 6) | (0 << 3) | (cc - 8)
        ins_extra = (0, 2)
        cp_extra = (ce, cn)
    simple_code(w, [sym], 704)
    # distance: address = (tid << ndbits) + index; max_distance = pos
    pos = filler
    address = (tid << NDBITS[length]) + index
    D = pos + address + 1
    dsym, dex, dn = dist_code_for(D)
    assert dsym < 16 + 0 + 48, dsym
    simple_code(w, [dsym], 64)
    # body: command symbol (0 bits), insert extra, copy extra
    w.w(ins_extra[0], ins_extra[1])
    w.w(cp_extra[0], cp_extra[1])
    # literals: zero bits each (single-symbol code)
    # distance: symbol 0 bits + extra
    w.w(dex, dn)
    return w.bytes()


def _copy_code(length):
    """copy length -> (code, extra, extra_bits)"""
    table = [(2,0),(3,0),(4,0),(5,0),(6,0),(7,0),(8,0),(9,0),
             (10,1),(12,1),(14,2),(18,2),(22,3),(30,3),(38,4),(54,4),
             (70,5),(102,5),(134,6),(198,7),(326,8),(582,9),(1094,10),(2118,24)]
    for code, (base, nb) in enumerate(table):
        if base <= length < base + (1 << nb):
            return code, length - base, nb
    raise ValueError(length)


OPS = {}
def _mk_ops():
    def ident(x): return x
    OPS["Identity"] = ident
    for k in range(1, 10):
        OPS[f"OmitLast{k}"] = (lambda kk: (lambda x: x[:-kk] if len(x) > kk else b""))(k)
        OPS[f"OmitFirst{k}"] = (lambda kk: (lambda x: x[kk:] if len(x) > kk else b""))(k)
    def ferment(x, all_):
        b = bytearray(x)
        i = 0
        while i < len(b):
            c = b[i]
            if c < 192:
                if 97 <= c <= 122:
                    b[i] ^= 32
                i += 1
            elif c < 224:
                if i + 1 < len(b):
                    b[i + 1] ^= 32
                i += 2
            else:
                if i + 2 < len(b):
                    b[i + 2] ^= 5
                i += 3
            if not all_:
                break
        return bytes(b)
    OPS["FermentFirst"] = lambda x: ferment(x, False)
    OPS["FermentAll"] = lambda x: ferment(x, True)
_mk_ops()


def derive_transforms(blob):
    # words with distinct content, mixed case, length >= 10 so every omit
    # is distinguishable; take a few words per length for cross-checking
    probes = []
    for length in (10, 12, 14):
        n = 1 << NDBITS[length]
        for index in (0, 7, n - 1):
            word = blob[DOFFSET[length] + index * length:
                        DOFFSET[length] + (index + 1) * length]
            probes.append((length, index, word))
    results = []
    for tid in range(121):
        triple = None
        for (length, index, word) in probes:
            out = None
            for m in range(1, 60):
                s = craft_dict_ref(length, index, tid, m)
                try:
                    o = brotlicffi.decompress(s)
                except Exception:
                    continue
                out = o[10:] if not (2 <= length - 2 <= 7) else o
                break
            if out is None:
                triple = ("DECODE_FAIL", None, None)
                break
            # classify
            cands = []
            for name, f in OPS.items():
                t = f(word)
                if not t:
                    continue
                i = out.find(t)
                while i >= 0:
                    cands.append((name, out[:i], out[i + len(t):]))
                    i = out.find(t, i + 1)
            if triple is None:
                triple = cands
            else:
                triple = [c for c in triple if c in cands]
        assert triple and triple != ("DECODE_FAIL", None, None), f"tid {tid}: {triple}"
        # prefer the canonical unique candidate; Identity beats OmitLast0-ish dupes
        best = sorted(triple, key=lambda c: (len(c[1]) + len(c[2]), c[0] != "Identity"))[0]
        results.append((tid, best[0], best[1], best[2]))
    return results


def craft_context_probe(mode):
    """One stream whose output is 65536 triples (p2, p1, ctx) for every
    byte pair under the given context mode (0..3)."""
    w = W()
    wbits_header(w)
    n = 65536
    mlen_header(w, 3 * n, islast=True)
    # literals: 2 block types; commands/distances: 1
    w.w(1, 1); w.w(0, 3)  # NBLTYPESL: varlen: bit1 + 3bits k=0 -> 2
    # block type code for literals: single symbol 0 (= switch to previous)
    simple_code(w, [0], 2 + 2)
    # block length code: single symbol 0 (counts 1..4, 2 extra bits)
    simple_code(w, [0], 26)
    w.w(1, 2)  # first L block length: symbol 0 (0 bits) + extra: 2 -> extra 1
    w.w(0, 1)  # NBLTYPESI = 1
    w.w(0, 1)  # NBLTYPESD = 1
    w.w(0, 2)  # NPOSTFIX
    w.w(0, 4)  # NDIRECT
    w.w(mode, 2); w.w(mode, 2)  # context mode per literal block type
    # NTREESL = 65: varlen: 1 + 3bits k=6 + 6 bits extra: (1<<6)+extra+1 = 65 -> extra 0
    w.w(1, 1); w.w(6, 3); w.w(0, 6)
    # literal context map: RLEMAX bit
    w.w(0, 1)
    # prefix code over 65 symbols: 64 (tree for block 0) at len 1, 0..63 at len 7
    lens = {s: 7 for s in range(64)}
    lens[64] = 1
    complex_code(w, lens, 65)
    codes = _canonical(lens)
    def emit_sym(s):
        pat, nb = codes[s]
        for i in range(nb):
            w.w((pat >> (nb - 1 - i)) & 1, 1)
    for _ in range(64):  # block 0 slice: all point at tree 64
        emit_sym(64)
    for c in range(64):  # block 1 slice: identity
        emit_sym(c)
    w.w(0, 1)  # no IMTF
    # distance context map: NTREESD = 1
    w.w(0, 1)
    # literal codes: tree 0..63 single-symbol emitting byte k; tree 64 flat 8-bit
    for k in range(64):
        simple_code(w, [k], 256)
    complex_code(w, {s: 8 for s in range(256)}, 256)
    lit_codes = _canonical({s: 8 for s in range(256)})
    # command code: one symbol: insert 3*n literals => insert code 23,
    # copy code 2; cell 7 (insert base 16, copy base 0, explicit dist)
    sym = (7 << 6) | (7 << 3) | 2
    simple_code(w, [sym], 704)
    # distance code (never used)
    simple_code(w, [0], 64)
    # body: command (0 bits) + insert extra 24 bits + copy extra 0
    w.w(3 * n - 22594, 24)
    # literals: for each pair (p1, p2): two flat literals + switch + probe + switch
    for p1 in range(256):
        for p2 in range(256):
            # block 0 emits [p2, p1]
            for b in (p2, p1):
                pat, nb = lit_codes[b]
                for i in range(nb):
                    w.w((pat >> (nb - 1 - i)) & 1, 1)
            # switch to block 1 for 1 literal: type symbol (0 bits) + count
            w.w(0, 2)  # count symbol 0 extra 0 -> length 1
            # probe literal: tree = cmap[64 + ctx], single-symbol, 0 bits
            # switch back to block 0 for 2 literals — except after the very
            # last probe: the decoder consumes a switch only when another
            # literal follows, and an unread 1-bit here breaks final-byte
            # zero padding (_ERROR_FORMAT_PADDING_2)
            if not (p1 == 255 and p2 == 255):
                w.w(1, 2)  # count 2
    return w.bytes()


def derive_context(mode):
    out = brotlicffi.decompress(craft_context_probe(mode))
    assert len(out) == 3 * 65536
    tab = [[0] * 256 for _ in range(256)]
    i = 0
    for p1 in range(256):
        for p2 in range(256):
            t = out[3 * i:3 * i + 3]
            assert t[0] == p2 and t[1] == p1, (p1, p2, t)
            tab[p1][p2] = t[2]
            i += 1
    return tab


def factor_context(tab, mode):
    """UTF8: ctx = lut0[p1] | lut1[p2] (lut1 in 0..3). Signed:
    ctx = lut2[p1]*8 + lut2s[p2]. Verify factorization exactly."""
    if mode == 2:
        # ctx = lut0[p1] | lut1[p2], bits may overlap (continuation-byte
        # p1 contexts are 1..3). Anchored at tab[0][0]==0 ⇒ lut0[0] ==
        # lut1[0] == 0, so row/col 0 read the luts off directly; the OR is
        # then verified exactly over all 65536 pairs.
        assert tab[0][0] == 0
        lut1 = [tab[0][p2] for p2 in range(256)]
        lut0 = [tab[p1][0] for p1 in range(256)]
        for p1 in range(256):
            for p2 in range(256):
                if tab[p1][p2] != (lut0[p1] | lut1[p2]):
                    raise AssertionError((p1, p2, tab[p1][p2], lut0[p1], lut1[p2]))
        return lut0, lut1
    if mode == 3:
        lutH = [tab[p1][0] >> 3 for p1 in range(256)]
        lutL = [tab[0][p2] & 7 for p2 in range(256)]
        for p1 in range(256):
            for p2 in range(256):
                if tab[p1][p2] != ((lutH[p1] << 3) | lutL[p2]):
                    raise AssertionError((p1, p2))
        return lutH, lutL
    return None


def gen_fixtures():
    """Deterministic (raw, compressed) pairs across qualities, window
    sizes, and content classes for the Scala decoder's differential spec.
    Written to src/test/resources/brotli/<name>.{raw,br}."""
    import random
    outdir = "src/test/resources/brotli"
    os.makedirs(outdir, exist_ok=True)
    rng = random.Random(7932)
    words = ("the quick brown fox jumps over a lazy dog categories technology "
             "information available copyright description government").split()
    html = ("<!DOCTYPE html><html><head><title>Example Domain</title></head>"
            "<body><div><h1>Example Domain</h1><p>This domain is for use in "
            "illustrative examples in documents. You may use this domain in "
            "literature without prior coordination or asking for permission."
            "</p><p><a href=\"https://www.iana.org/domains/example\">More "
            "information...</a></p></div></body></html>")
    corpora = {
        "empty": b"",
        "one": b"A",
        "short": b"hello, brotli world",
        "html": (html * 40).encode(),
        "repeat": (b"abcabcabcdabcde" * 2000),
        "words": (" ".join(rng.choice(words) for _ in range(20000))).encode(),
        "utf8": ("переводы 翻訳 מתרגם ترجمة — ‘smart’ quotes naïve façade "
                 "übergroß ñandú " * 800).encode(),
        "random": bytes(rng.randrange(256) for _ in range(100000)),
        "binary": bytes(((i * 7 + (i >> 8)) & 0xff) for i in range(150000)),
        "zeros": b"\x00" * (1 << 20),
        "mixed": b"".join((html.encode() if i % 3 == 0 else
                           bytes(rng.randrange(256) for _ in range(500)))
                          for i in range(100)),
    }
    n = 0
    for name, raw in corpora.items():
        with open(f"{outdir}/{name}.raw", "wb") as f:
            f.write(raw)
        for q in (0, 1, 5, 9, 11):
            for wb in (10, 16, 22, 24):
                # keep the matrix affordable: full quality sweep at wb=22,
                # full window sweep at q=9
                if wb != 22 and q != 9:
                    continue
                comp = brotlicffi.compress(raw, quality=q, lgwin=wb)
                assert brotlicffi.decompress(comp) == raw
                with open(f"{outdir}/{name}_q{q}_w{wb}.br", "wb") as f:
                    f.write(comp)
                n += 1
    print(f"{n} fixtures ({len(corpora)} raw corpora) written to {outdir}")


def main():
    blob = load_dict()
    cmd = sys.argv[1] if len(sys.argv) > 1 else "all"
    if cmd in ("all", "fixtures"):
        gen_fixtures()
    if cmd in ("all", "dict"):
        os.makedirs("src/main/resources/graft", exist_ok=True)
        with open("src/main/resources/graft/brotli_dict.bin", "wb") as f:
            f.write(blob)
        print("dict written,", hashlib.sha256(blob).hexdigest())
    if cmd in ("all", "transforms"):
        tr = derive_transforms(blob)
        with open("/tmp/brotli_transforms.json", "w") as f:
            json.dump([[t[0], t[1], t[2].decode('latin-1'), t[3].decode('latin-1')] for t in tr], f)
        for t in tr[:8]:
            print(t)
        print(f"... {len(tr)} transforms derived")
    if cmd in ("all", "context"):
        res = {}
        for mode in (0, 1, 2, 3):
            tab = derive_context(mode)
            if mode == 0:
                ok = all(tab[p1][p2] == (p1 & 0x3f) for p1 in range(256) for p2 in range(256))
                print("LSB6 matches p1&63:", ok)
            if mode == 1:
                ok = all(tab[p1][p2] == (p1 >> 2) for p1 in range(256) for p2 in range(256))
                print("MSB6 matches p1>>2:", ok)
            if mode in (2, 3):
                a, b = factor_context(tab, mode)
                res[mode] = (a, b)
                print(f"mode {mode} factored OK")
        with open("/tmp/brotli_context.json", "w") as f:
            json.dump({str(k): v for k, v in res.items()}, f)


if __name__ == "__main__":
    main()
