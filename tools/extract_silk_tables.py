"""Extract the Opus SILK constant tables (RFC 6716 §4.2 spec data:
probability models, LSF codebooks, pitch/LTP codebooks, cosine table)
from the reference's table unit into a generated Python module.

Usage: python tools/extract_silk_tables.py
Writes librempeg_tpu/codecs/opus/silk_tables.py
"""
import os
import re

SRC = "/root/reference/libavcodec/opus/tab.c"

WANT = [
    ("ff_silk_model_lbrr_flags_40", "MODEL_LBRR_FLAGS_40"),
    ("ff_silk_model_lbrr_flags_60", "MODEL_LBRR_FLAGS_60"),
    ("ff_silk_model_stereo_s1", "MODEL_STEREO_S1"),
    ("ff_silk_model_stereo_s2", "MODEL_STEREO_S2"),
    ("ff_silk_model_stereo_s3", "MODEL_STEREO_S3"),
    ("ff_silk_model_mid_only", "MODEL_MID_ONLY"),
    ("ff_silk_model_frame_type_inactive", "MODEL_FRAME_TYPE_INACTIVE"),
    ("ff_silk_model_frame_type_active", "MODEL_FRAME_TYPE_ACTIVE"),
    ("ff_silk_model_gain_highbits", "MODEL_GAIN_HIGHBITS"),
    ("ff_silk_model_gain_lowbits", "MODEL_GAIN_LOWBITS"),
    ("ff_silk_model_gain_delta", "MODEL_GAIN_DELTA"),
    ("ff_silk_model_lsf_s1", "MODEL_LSF_S1"),
    ("ff_silk_model_lsf_s2_ext", "MODEL_LSF_S2_EXT"),
    ("ff_silk_model_lsf_s2", "MODEL_LSF_S2"),
    ("ff_silk_model_lsf_interpolation_offset",
     "MODEL_LSF_INTERP_OFFSET"),
    ("ff_silk_model_pitch_highbits", "MODEL_PITCH_HIGHBITS"),
    ("ff_silk_model_pitch_lowbits_mb", "MODEL_PITCH_LOWBITS_MB"),
    ("ff_silk_model_pitch_delta", "MODEL_PITCH_DELTA"),
    ("ff_silk_model_pitch_contour_nb10ms",
     "MODEL_PITCH_CONTOUR_NB10MS"),
    ("ff_silk_model_pitch_contour_nb20ms",
     "MODEL_PITCH_CONTOUR_NB20MS"),
    ("ff_silk_model_pitch_contour_mbwb10ms",
     "MODEL_PITCH_CONTOUR_MBWB10MS"),
    ("ff_silk_model_pitch_contour_mbwb20ms",
     "MODEL_PITCH_CONTOUR_MBWB20MS"),
    ("ff_silk_model_ltp_filter0_sel", "MODEL_LTP_FILTER0_SEL"),
    ("ff_silk_model_ltp_filter1_sel", "MODEL_LTP_FILTER1_SEL"),
    ("ff_silk_model_ltp_filter2_sel", "MODEL_LTP_FILTER2_SEL"),
    ("ff_silk_model_ltp_filter", "MODEL_LTP_FILTER"),
    ("ff_silk_model_ltp_scale_index", "MODEL_LTP_SCALE_INDEX"),
    ("ff_silk_model_lcg_seed", "MODEL_LCG_SEED"),
    ("ff_silk_model_exc_rate", "MODEL_EXC_RATE"),
    ("ff_silk_model_pulse_count", "MODEL_PULSE_COUNT"),
    ("ff_silk_model_pulse_location", "MODEL_PULSE_LOCATION"),
    ("ff_silk_model_excitation_lsb", "MODEL_EXCITATION_LSB"),
    ("ff_silk_model_excitation_sign", "MODEL_EXCITATION_SIGN"),
    ("ff_silk_stereo_weights", "STEREO_WEIGHTS"),
    ("ff_silk_lsf_s2_model_sel_nbmb", "LSF_S2_MODEL_SEL_NBMB"),
    ("ff_silk_lsf_s2_model_sel_wb", "LSF_S2_MODEL_SEL_WB"),
    ("ff_silk_lsf_pred_weights_nbmb", "LSF_PRED_WEIGHTS_NBMB"),
    ("ff_silk_lsf_pred_weights_wb", "LSF_PRED_WEIGHTS_WB"),
    ("ff_silk_lsf_weight_sel_nbmb", "LSF_WEIGHT_SEL_NBMB"),
    ("ff_silk_lsf_weight_sel_wb", "LSF_WEIGHT_SEL_WB"),
    ("ff_silk_lsf_codebook_nbmb", "LSF_CODEBOOK_NBMB"),
    ("ff_silk_lsf_codebook_wb", "LSF_CODEBOOK_WB"),
    ("ff_silk_lsf_min_spacing_nbmb", "LSF_MIN_SPACING_NBMB"),
    ("ff_silk_lsf_min_spacing_wb", "LSF_MIN_SPACING_WB"),
    ("ff_silk_lsf_ordering_nbmb", "LSF_ORDERING_NBMB"),
    ("ff_silk_lsf_ordering_wb", "LSF_ORDERING_WB"),
    ("ff_silk_cosine", "COSINE"),
    ("ff_silk_pitch_scale", "PITCH_SCALE"),
    ("ff_silk_pitch_min_lag", "PITCH_MIN_LAG"),
    ("ff_silk_pitch_max_lag", "PITCH_MAX_LAG"),
    ("ff_silk_pitch_offset_nb10ms", "PITCH_OFFSET_NB10MS"),
    ("ff_silk_pitch_offset_nb20ms", "PITCH_OFFSET_NB20MS"),
    ("ff_silk_pitch_offset_mbwb10ms", "PITCH_OFFSET_MBWB10MS"),
    ("ff_silk_pitch_offset_mbwb20ms", "PITCH_OFFSET_MBWB20MS"),
    ("ff_silk_ltp_filter0_taps", "LTP_FILTER0_TAPS"),
    ("ff_silk_ltp_filter1_taps", "LTP_FILTER1_TAPS"),
    ("ff_silk_ltp_filter2_taps", "LTP_FILTER2_TAPS"),
    ("ff_silk_model_lsf_weight_nbmb", "MODEL_LSF_WEIGHT_NBMB"),
    ("ff_silk_model_lsf_weight_wb", "MODEL_LSF_WEIGHT_WB"),
    ("ff_silk_ltp_scale_factor", "LTP_SCALE_FACTOR"),
    ("ff_silk_shell_blocks", "SHELL_BLOCKS"),
    ("ff_silk_quant_offset", "QUANT_OFFSET"),
    ("ff_silk_stereo_interp_len", "STEREO_INTERP_LEN"),
]


def extract_array(src: str, name: str):
    m = re.search(re.escape(name) + r"\s*\[[^=]*=\s*\{", src)
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
    src = open(SRC).read()
    out = ["'''Opus SILK constant tables (RFC 6716 4.2 spec data),",
           "extracted by tools/extract_silk_tables.py. Do not edit.'''",
           "", "# flake8: noqa", ""]
    for cname, pyname in WANT:
        vals = extract_array(src, cname)
        out.append(f"{pyname} = {vals!r}")
        out.append("")
    out.append("# tab.h aliases: uniform models reused for pitch "
               "lowbits")
    out.append("MODEL_PITCH_LOWBITS_NB = MODEL_LCG_SEED")
    out.append("MODEL_PITCH_LOWBITS_WB = MODEL_GAIN_LOWBITS")
    out.append("")
    dst = os.path.join(os.path.dirname(__file__), "..",
                       "librempeg_tpu", "codecs", "opus",
                       "silk_tables.py")
    open(dst, "w").write("\n".join(out))
    print("wrote", dst)


if __name__ == "__main__":
    main()
