"""Extract the Opus/CELT constant tables (RFC 6716 spec data) from the
reference's table unit into a generated Python module.

These are ISO/IETF-standard constants (probability models, band
layouts, allocation tables, PVQ combinatorics), not expression; the
extraction mirrors tools/extract_mpeg4_tables.py et al.

Usage: python tools/extract_opus_tables.py
Writes librempeg_tpu/codecs/opus/tables_data.py
"""
import re
import os

SRC = "/root/reference/libavcodec/opus/tab.c"
SRC2 = "/root/reference/libavcodec/opus/frame_duration_tab.c"

WANT = [
    ("ff_celt_band_end", "BAND_END"),
    ("ff_celt_freq_bands", "FREQ_BANDS"),
    ("ff_celt_freq_range", "FREQ_RANGE"),
    ("ff_celt_log_freq_range", "LOG_FREQ_RANGE"),
    ("ff_celt_static_alloc", "STATIC_ALLOC"),
    ("ff_celt_static_caps", "STATIC_CAPS"),
    ("ff_celt_cache_bits", "CACHE_BITS"),
    ("ff_celt_cache_index", "CACHE_INDEX"),
    ("ff_celt_log2_frac", "LOG2_FRAC"),
    ("ff_celt_bit_interleave", "BIT_INTERLEAVE"),
    ("ff_celt_bit_deinterleave", "BIT_DEINTERLEAVE"),
    ("ff_celt_hadamard_order", "HADAMARD_ORDER"),
    ("ff_celt_qn_exp2", "QN_EXP2"),
    ("ff_celt_model_tapset", "MODEL_TAPSET"),
    ("ff_celt_model_spread", "MODEL_SPREAD"),
    ("ff_celt_model_alloc_trim", "MODEL_ALLOC_TRIM"),
    ("ff_celt_tf_select", "TF_SELECT"),
    ("ff_celt_mean_energy", "MEAN_ENERGY"),
    ("ff_celt_alpha_coef", "ALPHA_COEF"),
    ("ff_celt_beta_coef", "BETA_COEF"),
    ("ff_celt_coarse_energy_dist", "COARSE_ENERGY_DIST"),
    ("ff_celt_window_padded", "WINDOW_PADDED"),
    ("ff_celt_window2", "WINDOW2"),
    ("ff_celt_postfilter_taps", "POSTFILTER_TAPS"),
    ("celt_pvq_u", "PVQ_U"),
    ("ff_opus_frame_duration", "FRAME_DURATION"),
]


def extract_array(src: str, name: str):
    m = re.search(re.escape(name) + r"[^=]*=\s*\{", src)
    if not m:
        raise SystemExit(f"{name} not found")
    i = m.end() - 1
    depth = 0
    for j in range(i, len(src)):
        if src[j] == "{":
            depth += 1
        elif src[j] == "}":
            depth -= 1
            if depth == 0:
                body = src[i + 1:j]
                break
    else:
        raise SystemExit(f"{name}: unbalanced")
    body = re.sub(r"/\*.*?\*/", "", body, flags=re.S)
    body = re.sub(r"//[^\n]*", "", body)
    body = body.replace("{", "[").replace("}", "]")
    # normalize float suffixes and hex
    # strip float suffixes WITHOUT touching hex literals (0x0F !)
    body = re.sub(r"([0-9]*\.[0-9]+(?:[eE][+-]?[0-9]+)?)[fF]\b",
                  r"\1", body)
    body = re.sub(r"([0-9]+\.)[fF]\b", r"\1", body)
    body = re.sub(r",\s*\]", "]", body)
    vals = "[" + body + "]"
    vals = re.sub(r",\s*,", ",", vals)
    vals = re.sub(r"\[\s*,", "[", vals)
    vals = re.sub(r",\s*$", "", vals)
    return eval(vals)  # noqa: S307 - trusted numeric source


def main():
    src = open(SRC).read() + open(SRC2).read()
    out = ["'''Opus/CELT constant tables (RFC 6716 spec data), extracted",
           "by tools/extract_opus_tables.py. Do not edit by hand.'''",
           "", "# flake8: noqa", ""]
    for cname, pyname in WANT:
        vals = extract_array(src, cname)
        out.append(f"{pyname} = {vals!r}")
        out.append("")
    # PVQ row offsets (from ff_celt_pvq_u_row initializer)
    offs = re.findall(r"celt_pvq_u \+\s*(\d+)", src)
    out.append(f"PVQ_U_ROW = {[int(o) for o in offs]!r}")
    out.append("")
    out.append("MODEL_ENERGY_SMALL = MODEL_TAPSET  # tab.h:130 alias")
    out.append("")
    dst = os.path.join(os.path.dirname(__file__), "..",
                       "librempeg_tpu", "codecs", "opus",
                       "tables_data.py")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    open(dst, "w").write("\n".join(out))
    print("wrote", dst)


if __name__ == "__main__":
    main()
