"""PDF function evaluation + Separation/DeviceN tint → sRGB.

Re-implements the decision surface of the reference's
``pdfColorFunctions.js`` (/root/reference/js/pdf/pdfColorFunctions.js:1-938)
over this package's parsed object model (no regex-over-object-text):

- PostScript calculator functions (FunctionType 4): tokenizer + stack
  evaluator with degree-trig, ``atan`` normalized to [0, 360), and the
  stack ops (dup/exch/copy/index/roll/if/ifelse).
- Sampled functions (FunctionType 0): packed bit reads (1-32 bps),
  multilinear interpolation, Encode/Decode mapping.
- Exponential (2) and stitching (3) functions.
- Alternate-space conversion: DeviceGray/RGB/CMYK, CalGray/CalRGB
  (gamma+matrix → XYZ → sRGB), Lab (D50 default white point), ICCBased
  (header bytes 16-19 sniffed for a Lab data space, else /N routing).
- DeviceCMYK → RGB via the SWOP polynomial (public pdf.js
  ``src/core/colorspace.js`` DeviceCmykCS, Apache-2.0) with the
  reference's pure-K neutral-gray bypass.

Rounding note: JS ``Math.round`` is half-toward-+∞; all rounded values
here are ≥ 0, so ``floor(x + 0.5)`` matches it exactly (Python's
``round`` is half-to-even and would diverge on .5 boundaries).
"""

from __future__ import annotations

import math

from .objects import Name, StreamObj


def _jsround(x: float) -> int:
    return math.floor(x + 0.5)


# ---------------------------------------------------------------------------
# PostScript calculator (FunctionType 4)

def tokenize_ps(code: str):
    """Nested token lists for a PS calculator body
    (pdfColorFunctions.js:9-31)."""
    src = code.strip()
    if src.startswith("{") and src.endswith("}"):
        src = src[1:-1]
    tokens: list = []
    stack = [tokens]
    import re
    for m in re.finditer(r"\{|\}|[^\s{}]+", src):
        tok = m.group(0)
        if tok == "{":
            sub: list = []
            stack[-1].append(sub)
            stack.append(sub)
        elif tok == "}":
            if len(stack) > 1:
                stack.pop()
        else:
            try:
                stack[-1].append(float(tok))
            except ValueError:
                stack[-1].append(tok)
    return tokens


def evaluate_ps(tokens, inputs):
    """Evaluate a tokenized calculator program
    (pdfColorFunctions.js:38-124).  Booleans ride the stack as Python
    bools; bitwise ops coerce via int like the JS ``|``/``&``."""
    st: list = list(inputs)

    def exec_(toks):
        for tok in toks:
            if isinstance(tok, float):
                st.append(tok)
                continue
            if isinstance(tok, list):
                st.append(tok)
                continue
            if tok == "true":
                st.append(True)
                continue
            if tok == "false":
                st.append(False)
                continue
            try:
                if tok == "dup":
                    v = st.pop()
                    st.extend((v, v))
                elif tok == "exch":
                    x = st.pop()
                    y = st.pop()
                    st.extend((x, y))
                elif tok == "pop":
                    st.pop()
                elif tok == "copy":
                    n = int(st.pop())
                    if n > 0:
                        st.extend(st[-n:])
                elif tok == "index":
                    idx = int(st.pop())
                    st.append(st[-1 - idx])
                elif tok == "roll":
                    j = int(st.pop())
                    n = int(st.pop())
                    if n > 0:
                        group = st[-n:]
                        del st[-n:]
                        shift = ((j % n) + n) % n
                        st.extend(group[(k - shift) % n]
                                  for k in range(n))
                elif tok == "add":
                    x = st.pop()
                    st.append(st.pop() + x)
                elif tok == "sub":
                    x = st.pop()
                    st.append(st.pop() - x)
                elif tok == "mul":
                    x = st.pop()
                    st.append(st.pop() * x)
                elif tok == "div":
                    x = st.pop()
                    y = st.pop()
                    st.append(y / x if x != 0 else math.inf
                              if y > 0 else -math.inf if y < 0
                              else math.nan)
                elif tok == "idiv":
                    x = st.pop()
                    st.append(float(math.trunc(st.pop() / x))
                              if x else math.nan)
                elif tok == "mod":
                    x = st.pop()
                    y = st.pop()
                    # JS %: sign of dividend
                    st.append(math.fmod(y, x) if x else math.nan)
                elif tok == "neg":
                    st.append(-st.pop())
                elif tok == "abs":
                    st.append(abs(st.pop()))
                elif tok == "ceiling":
                    st.append(float(math.ceil(st.pop())))
                elif tok == "floor":
                    st.append(float(math.floor(st.pop())))
                elif tok == "round":
                    st.append(float(_jsround(st.pop())))
                elif tok == "truncate":
                    st.append(float(math.trunc(st.pop())))
                elif tok == "sqrt":
                    st.append(math.sqrt(st.pop()))
                elif tok == "exp":
                    x = st.pop()
                    st.append(st.pop() ** x)
                elif tok == "ln":
                    st.append(math.log(st.pop()))
                elif tok == "log":
                    st.append(math.log10(st.pop()))
                elif tok == "sin":
                    st.append(math.sin(st.pop() * math.pi / 180))
                elif tok == "cos":
                    st.append(math.cos(st.pop() * math.pi / 180))
                elif tok == "atan":
                    den = st.pop()
                    num = st.pop()
                    ang = math.atan2(num, den) * 180 / math.pi
                    if ang < 0:
                        ang += 360
                    st.append(ang)
                elif tok == "eq":
                    x = st.pop()
                    st.append(st.pop() == x)
                elif tok == "ne":
                    x = st.pop()
                    st.append(st.pop() != x)
                elif tok == "gt":
                    x = st.pop()
                    st.append(st.pop() > x)
                elif tok == "ge":
                    x = st.pop()
                    st.append(st.pop() >= x)
                elif tok == "lt":
                    x = st.pop()
                    st.append(st.pop() < x)
                elif tok == "le":
                    x = st.pop()
                    st.append(st.pop() <= x)
                elif tok in ("and", "or", "xor"):
                    x = st.pop()
                    y = st.pop()
                    if isinstance(x, bool) and isinstance(y, bool):
                        st.append((x and y) if tok == "and" else
                                  (x or y) if tok == "or" else (x != y))
                    else:
                        xi, yi = int(x), int(y)
                        st.append(float(yi & xi if tok == "and" else
                                        yi | xi if tok == "or" else
                                        yi ^ xi))
                elif tok == "not":
                    x = st.pop()
                    st.append((not x) if isinstance(x, bool)
                              else float(~int(x)))
                elif tok == "bitshift":
                    shift = int(st.pop())
                    val = int(st.pop())
                    st.append(float(val << shift if shift >= 0
                                    else val >> -shift))
                elif tok == "if":
                    proc = st.pop()
                    cond = st.pop()
                    if cond:
                        exec_(proc)
                elif tok == "ifelse":
                    false_proc = st.pop()
                    true_proc = st.pop()
                    cond = st.pop()
                    exec_(true_proc if cond else false_proc)
                elif tok == "cvi":
                    st.append(float(math.trunc(st.pop())))
                elif tok == "cvr":
                    pass
            except (IndexError, ValueError, OverflowError):
                pass

    exec_(tokens)
    return st


# ---------------------------------------------------------------------------
# Function parsing / evaluation (types 0, 2, 3, 4)

def parse_function(pdf, obj):
    """Parse a PDF function object (dict or stream) into an eval-ready
    dict, or None (pdfColorFunctions.js:134-215)."""
    obj = pdf.resolve(obj)
    if isinstance(obj, StreamObj):
        d = obj.dict
    elif isinstance(obj, dict):
        d = obj
    else:
        return None
    ftype = pdf.resolve(d.get("FunctionType"))
    if not isinstance(ftype, (int, float)):
        return None
    ftype = int(ftype)
    domain = [float(pdf.resolve(v))
              for v in (pdf.resolve(d.get("Domain")) or [0, 1])]
    n_inputs = max(1, len(domain) // 2)
    rng = pdf.resolve(d.get("Range"))
    rng = [float(pdf.resolve(v)) for v in rng] \
        if isinstance(rng, list) else None

    if ftype == 0:
        if not isinstance(obj, StreamObj):
            return None
        size = pdf.resolve(d.get("Size"))
        size = [int(pdf.resolve(v)) for v in size] \
            if isinstance(size, list) else [256] * n_inputs
        bps = int(pdf.resolve(d.get("BitsPerSample")) or 8)
        encode = pdf.resolve(d.get("Encode"))
        encode = [float(pdf.resolve(v)) for v in encode] \
            if isinstance(encode, list) else None
        decode = pdf.resolve(d.get("Decode"))
        decode = [float(pdf.resolve(v)) for v in decode] \
            if isinstance(decode, list) else rng
        try:
            samples = pdf.stream_bytes(obj)
        except Exception:
            return None
        n_outputs = len(rng) // 2 if rng else 1
        return {"type": 0, "domain": domain, "range": rng,
                "n_inputs": n_inputs, "n_outputs": n_outputs,
                "size": size, "bps": bps, "encode": encode,
                "decode": decode, "samples": samples}

    if ftype == 2:
        c0 = pdf.resolve(d.get("C0"))
        c0 = [float(pdf.resolve(v)) for v in c0] \
            if isinstance(c0, list) else [0.0]
        c1 = pdf.resolve(d.get("C1"))
        c1 = [float(pdf.resolve(v)) for v in c1] \
            if isinstance(c1, list) else [1.0]
        n = pdf.resolve(d.get("N"))
        n = float(n) if isinstance(n, (int, float)) else 1.0
        n_outputs = max(len(c0), len(c1), 1)
        c0 = c0 + [0.0] * (n_outputs - len(c0))
        c1 = c1 + [1.0] * (n_outputs - len(c1))
        return {"type": 2, "domain": domain, "range": rng,
                "n_inputs": 1, "n_outputs": n_outputs,
                "c0": c0, "c1": c1, "n": n}

    if ftype == 3:
        fns = pdf.resolve(d.get("Functions"))
        if not isinstance(fns, list):
            return None
        subs = []
        for f in fns:
            p = parse_function(pdf, f)
            if p is None:
                return None
            subs.append(p)
        if not subs:
            return None
        bounds = pdf.resolve(d.get("Bounds"))
        bounds = [float(pdf.resolve(v)) for v in bounds] \
            if isinstance(bounds, list) else []
        enc = pdf.resolve(d.get("Encode"))
        if isinstance(enc, list):
            enc = [float(pdf.resolve(v)) for v in enc]
        else:
            enc = []
            for s in subs:
                enc.extend(s["domain"][:2])
        return {"type": 3, "domain": domain, "range": rng,
                "n_inputs": 1, "n_outputs": subs[0]["n_outputs"],
                "functions": subs, "bounds": bounds, "encode": enc}

    if ftype == 4:
        if not isinstance(obj, StreamObj):
            return None
        try:
            code = pdf.stream_bytes(obj).decode("utf-8", "replace")
        except Exception:
            return None
        n_outputs = len(rng) // 2 if rng else 0
        return {"type": 4, "domain": domain, "range": rng,
                "n_inputs": n_inputs, "n_outputs": n_outputs,
                "tokens": tokenize_ps(code)}
    return None


def _read_sample(samples: bytes, index: int, bps: int) -> int:
    """Packed big-endian sample read (pdfColorFunctions.js:298-324)."""
    if bps == 8:
        return samples[index] if index < len(samples) else 0
    if bps < 8:
        bit_off = index * bps
        byte_idx = bit_off >> 3
        bit_in = bit_off & 7
        v = ((samples[byte_idx] if byte_idx < len(samples) else 0) << 8) \
            | (samples[byte_idx + 1] if byte_idx + 1 < len(samples) else 0)
        v >>= 16 - bps - bit_in
        return v & ((1 << bps) - 1)
    nbytes = bps // 8
    off = index * nbytes
    v = 0
    for j in range(nbytes):
        v = v * 256 + (samples[off + j] if off + j < len(samples) else 0)
    return v


def _eval_sampled(fn, inputs):
    """Multilinear interpolation over the sample grid
    (pdfColorFunctions.js:326-441); Size[0] is the fastest axis."""
    domain, encode, decode = fn["domain"], fn["encode"], fn["decode"]
    size, samples, bps = fn["size"], fn["samples"], fn["bps"]
    n_outputs = fn["n_outputs"]
    max_sample = (1 << bps) - 1
    nd = fn["n_inputs"]

    lo = [0] * nd
    hi = [0] * nd
    frac = [0.0] * nd
    for i in range(nd):
        d_min, d_max = domain[i * 2], domain[i * 2 + 1]
        e_min = encode[i * 2] if encode else 0.0
        e_max = encode[i * 2 + 1] if encode else size[i] - 1
        span = (d_max - d_min) or 1.0
        val = (inputs[i] - d_min) / span * (e_max - e_min) + e_min
        val = max(0.0, min(size[i] - 1, val))
        lo[i] = int(math.floor(val))
        hi[i] = min(lo[i] + 1, size[i] - 1)
        frac[i] = val - lo[i]

    out = [0.0] * n_outputs
    for corner in range(1 << nd):
        weight = 1.0
        linear = 0
        stride = 1
        for i in range(nd):
            use_hi = (corner >> i) & 1
            idx = hi[i] if use_hi else lo[i]
            weight *= frac[i] if use_hi else (1.0 - frac[i])
            linear += idx * stride
            stride *= size[i]
        if weight == 0.0:
            continue
        for oi in range(n_outputs):
            out[oi] += weight * _read_sample(
                samples, linear * n_outputs + oi, bps)

    for oi in range(n_outputs):
        if decode:
            d_min, d_max = decode[oi * 2], decode[oi * 2 + 1]
            out[oi] = out[oi] / max_sample * (d_max - d_min) + d_min
        else:
            out[oi] /= max_sample
    return out


def _eval_stitching(fn, x):
    """(pdfColorFunctions.js:443-467)."""
    bounds = fn["bounds"]
    k = 0
    while k < len(bounds) and x >= bounds[k]:
        k += 1
    if k >= len(fn["functions"]):
        return None
    sub = fn["functions"][k]
    lower = fn["domain"][0] if k == 0 else bounds[k - 1]
    upper = fn["domain"][1] if k == len(bounds) else bounds[k]
    enc_min = fn["encode"][k * 2]
    enc_max = fn["encode"][k * 2 + 1]
    t = enc_min if upper == lower else \
        enc_min + (x - lower) * (enc_max - enc_min) / (upper - lower)
    return evaluate_function(sub, [t])


def evaluate_function(fn, inputs):
    """Evaluate with Domain input clip + Range output clip
    (pdfColorFunctions.js:216-271)."""
    if fn is None:
        return None
    clipped = []
    for i in range(fn["n_inputs"]):
        v = inputs[i] if i < len(inputs) and inputs[i] is not None else 0.0
        clipped.append(max(fn["domain"][i * 2],
                           min(fn["domain"][i * 2 + 1], v)))
    t = fn["type"]
    if t == 0:
        out = _eval_sampled(fn, clipped)
    elif t == 2:
        x = clipped[0]
        tn = x if fn["n"] == 1 else x ** fn["n"]
        out = [c0 + tn * (c1 - c0)
               for c0, c1 in zip(fn["c0"], fn["c1"])]
    elif t == 3:
        out = _eval_stitching(fn, clipped[0])
    elif t == 4:
        result = evaluate_ps(fn["tokens"], clipped)
        out = result[-fn["n_outputs"]:] if fn["n_outputs"] > 0 else result
        out = [float(v) if not isinstance(v, bool) else (1.0 if v else 0.0)
               for v in out]
    else:
        return None
    if out is not None and fn["range"]:
        rng = fn["range"]
        for oi in range(len(out)):
            if oi * 2 + 1 < len(rng):
                out[oi] = max(rng[oi * 2], min(rng[oi * 2 + 1], out[oi]))
    return out


# ---------------------------------------------------------------------------
# Alternate color spaces → sRGB

def _srgb_gamma(v: float) -> float:
    return 12.92 * v if v <= 0.0031308 else 1.055 * v ** (1 / 2.4) - 0.055


def xyz_to_srgb(x, y, z, wp):
    """Absolute XYZ → sRGB bytes with white-point scaling
    (pdfColorFunctions.js:570-591)."""
    ax = x * 0.9505 / wp[0] if wp[0] > 0 else x
    ay = y / wp[1] if wp[1] > 0 else y
    az = z * 1.089 / wp[2] if wp[2] > 0 else z
    lr = 3.2406 * ax - 1.5372 * ay - 0.4986 * az
    lg = -0.9689 * ax + 1.8758 * ay + 0.0415 * az
    lb = 0.0557 * ax - 0.2040 * ay + 1.0570 * az
    return tuple(_jsround(255 * max(0.0, min(1.0, _srgb_gamma(v))))
                 for v in (lr, lg, lb))


_DEFAULT_LAB_WP = (0.9642, 1.0, 0.8249)


def cmyk_to_rgb(c, m, y, k):
    """CMYK (0-1) → RGB bytes: pure-K neutral bypass + the SWOP
    polynomial from public pdf.js (pdfColorFunctions.js:597-653)."""
    if c == 0 and m == 0 and y == 0:
        gray = max(0, min(255, _jsround(255 * (1 - k))))
        return (gray, gray, gray)
    if c == 1 and m == 1 and y == 1 and k == 1:
        return (0, 0, 0)
    r = 255 \
        + c * (-4.387332384609988 * c + 54.48615194189176 * m
               + 18.82290502165302 * y + 212.25662451639585 * k
               - 285.2331026137004) \
        + m * (1.7149763477362134 * m - 5.6096736904047315 * y
               - 17.873870861415444 * k - 5.497006427196366) \
        + y * (-2.5217340131683033 * y - 21.248923337353073 * k
               + 17.5119270841813) \
        + k * (-21.86122147463605 * k - 189.48180835922747)
    g = 255 \
        + c * (8.841041422036149 * c + 60.118027045597366 * m
               + 6.871425592049007 * y + 31.159100130055922 * k
               - 79.2970844816548) \
        + m * (-15.310361306967817 * m + 17.575251261109482 * y
               + 131.35250912493976 * k - 190.9453302588951) \
        + y * (4.444339102852739 * y + 9.8632861493405 * k
               - 24.86741582555878) \
        + k * (-20.737325471181034 * k - 187.80453709719578)
    b = 255 \
        + c * (0.8842522430003296 * c + 8.078677503112928 * m
               + 30.89978309703729 * y - 0.23883238689178934 * k
               - 14.183576799673286) \
        + m * (10.49593273432072 * m + 63.02378494754052 * y
               + 50.606957656360734 * k - 112.23884253719248) \
        + y * (0.03296041114873217 * y + 115.60384449646641 * k
               - 193.58209356861505) \
        + k * (-22.33816807309886 * k - 180.12613974708367)
    return (max(0, min(255, _jsround(r))),
            max(0, min(255, _jsround(g))),
            max(0, min(255, _jsround(b))))


def parse_alt_color_space(pdf, cs):
    """Classify an alternate color space object
    (pdfColorFunctions.js:478-556).  Returns a dict with ``type`` in
    DeviceRGB/DeviceGray/DeviceCMYK/CalRGB/CalGray/Lab."""
    cs = pdf.resolve(cs)
    out = {"type": "DeviceRGB"}
    name = None
    params = None
    if isinstance(cs, Name) or isinstance(cs, str):
        name = str(cs)
    elif isinstance(cs, list) and cs:
        name = str(pdf.resolve(cs[0]))
        if len(cs) > 1:
            params = pdf.resolve(cs[1])

    if name == "Lab":
        out["type"] = "Lab"
        if isinstance(params, dict):
            wp = pdf.resolve(params.get("WhitePoint"))
            if isinstance(wp, list):
                out["white_point"] = [float(pdf.resolve(v)) for v in wp]
    elif name == "DeviceCMYK":
        out["type"] = "DeviceCMYK"
    elif name == "DeviceRGB":
        out["type"] = "DeviceRGB"
    elif name == "DeviceGray":
        out["type"] = "DeviceGray"
    elif name == "CalRGB":
        out["type"] = "CalRGB"
        if isinstance(params, dict):
            gamma = pdf.resolve(params.get("Gamma"))
            if isinstance(gamma, list):
                out["gamma"] = [float(pdf.resolve(v)) for v in gamma]
            matrix = pdf.resolve(params.get("Matrix"))
            if isinstance(matrix, list):
                out["matrix"] = [float(pdf.resolve(v)) for v in matrix]
    elif name == "CalGray":
        out["type"] = "CalGray"
    elif name == "ICCBased":
        stream = params if isinstance(params, StreamObj) else None
        data_cs = None
        if stream is not None:
            try:
                profile = pdf.stream_bytes(stream)
                if len(profile) >= 20:
                    data_cs = profile[16:20].decode("latin-1").strip()
            except Exception:
                pass
        if data_cs == "Lab":
            out["type"] = "Lab"
            alt = pdf.resolve(stream.dict.get("Alternate")) \
                if stream is not None else None
            if isinstance(alt, list) and len(alt) > 1:
                p = pdf.resolve(alt[1])
                if isinstance(p, dict):
                    wp = pdf.resolve(p.get("WhitePoint"))
                    if isinstance(wp, list):
                        out["white_point"] = [float(pdf.resolve(v))
                                              for v in wp]
        else:
            n = None
            if stream is not None:
                n = pdf.resolve(stream.dict.get("N"))
            if not isinstance(n, (int, float)):
                n = 4 if data_cs == "CMYK" else 1 if data_cs == "GRAY" \
                    else 3
            n = int(n)
            out["type"] = "DeviceCMYK" if n == 4 else \
                "DeviceGray" if n == 1 else "DeviceRGB"
    return out


def alt_cs_to_rgb(alt, comp):
    """Components in the alt space's natural range → RGB bytes
    (pdfColorFunctions.js:659-712)."""
    t = alt["type"]

    def c(i):
        return comp[i] if i < len(comp) and comp[i] is not None else 0.0

    if t == "DeviceCMYK":
        r, g, b = cmyk_to_rgb(c(0), c(1), c(2), c(3))
    elif t in ("DeviceGray", "CalGray"):
        gray = _jsround(255 * max(0.0, min(1.0, c(0))))
        r = g = b = gray
    elif t == "CalRGB":
        gamma = alt.get("gamma") or [1, 1, 1]
        a_ = c(0) ** gamma[0] if c(0) >= 0 else 0.0
        b_ = c(1) ** gamma[1] if c(1) >= 0 else 0.0
        c_ = c(2) ** gamma[2] if c(2) >= 0 else 0.0
        m = alt.get("matrix") or [1, 0, 0, 0, 1, 0, 0, 0, 1]
        x = m[0] * a_ + m[3] * b_ + m[6] * c_
        y = m[1] * a_ + m[4] * b_ + m[7] * c_
        z = m[2] * a_ + m[5] * b_ + m[8] * c_
        wp = (m[0] + m[3] + m[6], m[1] + m[4] + m[7], m[2] + m[5] + m[8])
        r, g, b = xyz_to_srgb(x, y, z, wp)
    elif t == "Lab":
        l_star, a_star, b_star = c(0), c(1), c(2)
        fy = (l_star + 16) / 116
        fx = fy + a_star / 500
        fz = fy - b_star / 200
        delta = 6 / 29

        def f_inv(ft):
            return ft ** 3 if ft > delta \
                else 3 * delta * delta * (ft - 4 / 29)
        wp = alt.get("white_point") or _DEFAULT_LAB_WP
        r, g, b = xyz_to_srgb(wp[0] * f_inv(fx), wp[1] * f_inv(fy),
                              wp[2] * f_inv(fz), wp)
    else:
        r = _jsround(255 * c(0))
        g = _jsround(255 * c(1))
        b = _jsround(255 * c(2))
    return (max(0, min(255, r)), max(0, min(255, g)), max(0, min(255, b)))


def parse_tint_color_space(pdf, cs):
    """Parse a ``[/Separation name alt tint]`` or
    ``[/DeviceN [names] alt tint ...]`` array into
    ``{tint_fn, alt_cs, n_inputs}`` or None
    (pdfColorFunctions.js:714-810; the object model replaces the
    reference's text-scanning heuristics)."""
    cs = pdf.resolve(cs)
    if not isinstance(cs, list) or len(cs) < 4:
        return None
    family = str(pdf.resolve(cs[0]))
    if family == "Separation":
        n_inputs = 1
        alt = parse_alt_color_space(pdf, cs[2])
        tint_fn = parse_function(pdf, cs[3])
    elif family == "DeviceN":
        names = pdf.resolve(cs[1])
        n_inputs = len(names) if isinstance(names, list) else 1
        alt = parse_alt_color_space(pdf, cs[2])
        tint_fn = parse_function(pdf, cs[3])
    else:
        return None
    if tint_fn is None:
        return None
    return {"tint_fn": tint_fn, "alt_cs": alt, "n_inputs": n_inputs}


def tint_components_to_rgb(parsed, components):
    """Tint values → RGB bytes, or None
    (pdfColorFunctions.js:815-823)."""
    if not parsed or not parsed.get("tint_fn"):
        return None
    out = evaluate_function(parsed["tint_fn"], components)
    if out is None:
        return None
    return alt_cs_to_rgb(parsed["alt_cs"], out)


def color_to_rgb(c):
    """Normalize a raw fill color (1/3/4 components) to 0-1 RGB for
    cross-space comparison (parsePdfDoc.js:49-57)."""
    if c is None:
        return None
    if len(c) == 1:
        return (c[0], c[0], c[0])
    if len(c) == 3:
        return (c[0], c[1], c[2])
    if len(c) == 4:
        r, g, b = cmyk_to_rgb(c[0], c[1], c[2], c[3])
        return (r / 255, g / 255, b / 255)
    return None


def rgb_to_hex(rgb01):
    """[0-1]³ → '#rrggbb' (parsePdfDoc.js:59-69)."""
    def h(x):
        return format(max(0, min(255, _jsround(x * 255))), "02x")
    return f"#{h(rgb01[0])}{h(rgb01[1])}{h(rgb01[2])}"
