"""MPEG-4 part 2 (Simple Profile) video decoder.

Analog of /root/reference/libavcodec/mpeg4videodec.c + h263dec.c,
restructured: the host parses headers and entropy-decodes the MB layer
into dense coefficient/MV tensors (numpy); the per-pixel half — dequant,
IDCT, half-pel MC, reconstruction — runs as batched array ops (device
or vectorized host, selected by frame size).

Supported: rectangular I/P VOPs, H.263 quant (quant_type=0), CAVLC-era
RL coding with all three escape modes, DC/AC prediction, f_code 1..7
half-pel MVs, 1MV and 4MV macroblocks, dquant, intra_dc_vlc_thr.
Decodes both our encoder's output and the reference encoder's default
streams (validated in tests).
"""
from __future__ import annotations

import numpy as np

from librempeg_tpu.codecs.api import CodecInfo, Decoder, register_decoder
from librempeg_tpu.codecs.flac.bitio import BitReaderMSB
from librempeg_tpu.codecs.mpeg4 import tables as T
from librempeg_tpu.core.errors import InvalidData, Unsupported
from librempeg_tpu.core.frame import VideoFrame
from librempeg_tpu.core.packet import Packet
from librempeg_tpu.core.rational import Rational

# ---------------------------------------------------------------------------
# VLC decoding helpers
# ---------------------------------------------------------------------------


class Vlc:
    """Canonical (code,len) table decoder via (len,code) dict lookup."""

    def __init__(self, entries, symbols=None, max_len=16):
        self.lut = {}
        self.max_len = 0
        for i, (code, ln) in enumerate(entries):
            sym = symbols[i] if symbols is not None else i
            self.lut[(ln, code)] = sym
            self.max_len = max(self.max_len, ln)

    def read(self, br: BitReaderMSB):
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.read(1)
            sym = self.lut.get((ln, code))
            if sym is not None:
                return sym
        raise InvalidData("invalid VLC code")


_INTRA_MCBPC_VLC = Vlc(T.INTRA_MCBPC[:8])
_INTER_MCBPC_VLC = Vlc(T.INTER_MCBPC)
_CBPY_VLC = Vlc(T.CBPY)
_MV_VLC = Vlc(T.MVTAB)
_DC_LUM_VLC = Vlc(T.DC_LUM)
_DC_CHROM_VLC = Vlc(T.DC_CHROM)


def _rl_vlc(vlc_entries):
    return Vlc(vlc_entries)


_INTRA_RL_VLC = _rl_vlc(T.INTRA_VLC)
_INTER_RL_VLC = _rl_vlc(T.INTER_VLC)


def _rl_maxes(index):
    max_level = {}
    max_run = {}
    for (last, run, level) in index:
        max_level[(last, run)] = max(max_level.get((last, run), 0), level)
        max_run[(last, level)] = max(max_run.get((last, level), 0), run)
    return max_level, max_run


def _rl_inverse(levels, runs, split):
    out = []
    for i in range(len(levels)):
        out.append((1 if i >= split else 0, runs[i], levels[i]))
    return out


_INTRA_EVENTS = _rl_inverse(T.INTRA_LEVEL, T.INTRA_RUN, T.INTRA_LAST_SPLIT)
_INTER_EVENTS = _rl_inverse(T.INTER_LEVEL, T.INTER_RUN, T.INTER_LAST_SPLIT)
_INTRA_MAXL, _INTRA_MAXR = _rl_maxes(_INTRA_EVENTS)
_INTER_MAXL, _INTER_MAXR = _rl_maxes(_INTER_EVENTS)

# alternate scans for AC prediction (spec Fig 7-2/7-3; zigzag shared)
_ALT_HORIZ = np.array([
    0, 1, 2, 3, 8, 9, 16, 17, 10, 11, 4, 5, 6, 7, 15, 14,
    13, 12, 19, 18, 24, 25, 32, 33, 26, 27, 20, 21, 22, 23, 28, 29,
    30, 31, 34, 35, 40, 41, 48, 49, 42, 43, 36, 37, 38, 39, 44, 45,
    46, 47, 50, 51, 56, 57, 58, 59, 52, 53, 54, 55, 60, 61, 62, 63],
    np.int32)
_ALT_VERT = np.array([
    0, 8, 16, 24, 1, 9, 2, 10, 17, 25, 32, 40, 48, 56, 57, 49,
    41, 33, 26, 18, 3, 11, 4, 12, 19, 27, 34, 42, 50, 58, 35, 43,
    51, 59, 20, 28, 5, 13, 6, 14, 21, 29, 36, 44, 52, 60, 37, 45,
    53, 61, 22, 30, 7, 15, 23, 31, 38, 46, 54, 62, 39, 47, 55, 63],
    np.int32)

_DC_VLC_THR_CUTOFF = [99, 13, 15, 17, 19, 21, 23, 0]

_STARTCODE_VOL_LO, _STARTCODE_VOL_HI = 0x120, 0x12F
_SC_USERDATA, _SC_GOP, _SC_VSO, _SC_VOP = 0x1B2, 0x1B3, 0x1B5, 0x1B6


class _VolInfo:
    width = 0
    height = 0
    time_res = 25
    inc_bits = 5
    quant_type = 0
    interlaced = False
    quarter_sample = False
    resync_disable = True


def _next_start_code(data: bytes, pos: int) -> int:
    i = data.find(b"\x00\x00\x01", pos)
    return i if i >= 0 else len(data)


class Mpeg4BitstreamDecoder:
    """Stateful stream decoder (host entropy layer)."""

    def __init__(self):
        self.vol = None
        self.ref = None   # (y, u, v) int16 reference planes

    # -- headers ------------------------------------------------------
    def _parse_vol(self, br: BitReaderMSB):
        v = _VolInfo()
        br.read(1)                      # random_accessible
        br.read(8)                      # object type
        if br.read(1):                  # is_object_layer_identifier
            br.read(4)
            br.read(3)
        aspect = br.read(4)
        if aspect == 15:
            br.read(8)
            br.read(8)
        if br.read(1):                  # vol_control_parameters
            br.read(2)                  # chroma format
            br.read(1)                  # low delay
            if br.read(1):              # vbv parameters
                for _ in range(5):
                    br.read(16)         # includes marker bits (15+1 x5ish)
        shape = br.read(2)
        if shape != 0:
            raise Unsupported("mpeg4: non-rectangular VOL")
        br.read(1)
        v.time_res = br.read(16)
        br.read(1)
        v.inc_bits = max(1, (v.time_res - 1).bit_length())
        if br.read(1):                  # fixed_vop_rate
            br.read(v.inc_bits)
        br.read(1)
        v.width = br.read(13)
        br.read(1)
        v.height = br.read(13)
        br.read(1)
        v.interlaced = bool(br.read(1))
        br.read(1)                      # obmc_disable
        if br.read(1):                  # sprite_enable
            raise Unsupported("mpeg4: sprites/GMC")
        if br.read(1):                  # not_8_bit
            raise Unsupported("mpeg4: extended bit depth")
        v.quant_type = br.read(1)
        if v.quant_type:
            raise Unsupported("mpeg4: MPEG quantization matrices")
        if not br.read(1):              # complexity_estimation_disable
            raise Unsupported("mpeg4: complexity estimation headers")
        v.resync_disable = bool(br.read(1))
        if br.read(1):                  # data_partitioned
            raise Unsupported("mpeg4: data partitioning")
        if br.read(1):                  # scalability
            raise Unsupported("mpeg4: scalability")
        self.vol = v

    # -- frame decode ---------------------------------------------------
    def decode_frame(self, data: bytes):
        pos = 0
        frame = None
        while pos < len(data) - 3:
            sc = _next_start_code(data, pos)
            if sc >= len(data) - 3:
                break
            code = 0x100 | data[sc + 3]
            payload_start = sc + 4
            end = _next_start_code(data, payload_start)
            if _STARTCODE_VOL_LO <= code <= _STARTCODE_VOL_HI:
                self._parse_vol(BitReaderMSB(data[payload_start:end]))
            elif code == _SC_VOP:
                frame = self._decode_vop(
                    BitReaderMSB(data[payload_start:]))
                break
            pos = end
        return frame

    def _decode_vop(self, br: BitReaderMSB):
        if self.vol is None:
            raise InvalidData("mpeg4: VOP before VOL")
        v = self.vol
        ctype = br.read(2)
        while br.read(1):               # modulo_time_base
            pass
        br.read(1)
        br.read(v.inc_bits)
        br.read(1)
        if not br.read(1):              # vop_coded
            return None
        rounding = 0
        if ctype == 1:
            rounding = br.read(1)
        if not v.resync_disable:
            # vop_shape==rect: intra_dc_vlc_thr comes after optional
            # video packet stuff; resync markers unsupported here
            pass
        dc_thr = br.read(3)
        if v.interlaced:
            br.read(1)
            br.read(1)
        qp = br.read(5)
        fcode = 1
        if ctype == 1:
            fcode = br.read(3)
        elif ctype == 2:
            raise Unsupported("mpeg4: B-VOPs")
        if ctype == 0:
            out = self._decode_i(br, qp, dc_thr)
        else:
            out = self._decode_p(br, qp, dc_thr, fcode, rounding)
        self.ref = out
        return out

    # -- block-level helpers -------------------------------------------
    def _read_dc(self, br, chroma):
        size = (_DC_CHROM_VLC if chroma else _DC_LUM_VLC).read(br)
        if size == 0:
            return 0
        v = br.read(size)
        if v >> (size - 1) == 0:
            v = v - (1 << size) + 1
        if size > 8:
            br.read(1)                  # marker
        return v

    def _read_block(self, br, intra, use_dc_vlc, chroma, qp):
        """Returns 64 quantized coeffs in SCAN order (not dezigzagged)."""
        out = np.zeros(64, np.int32)
        idx = 0
        if intra and use_dc_vlc:
            out[0] = self._read_dc(br, chroma)
            idx = 1
        vlc = _INTRA_RL_VLC if intra and use_dc_vlc else (
            _INTRA_RL_VLC if intra else _INTER_RL_VLC)
        events = _INTRA_EVENTS if intra else _INTER_EVENTS
        maxl = _INTRA_MAXL if intra else _INTER_MAXL
        maxr = _INTRA_MAXR if intra else _INTER_MAXR
        rl = _INTRA_RL_VLC if intra else _INTER_RL_VLC
        while idx < 64:
            sym = rl.read(br)
            if sym == 102:              # ESCAPE
                if br.read(1) == 0:     # type 1: level offset
                    sym2 = rl.read(br)
                    if sym2 == 102:
                        raise InvalidData("mpeg4: double escape")
                    last, run, level = events[sym2]
                    level += maxl[(last, run)]
                    if br.read(1):
                        level = -level
                elif br.read(1) == 0:   # type 2: run offset
                    sym2 = rl.read(br)
                    if sym2 == 102:
                        raise InvalidData("mpeg4: double escape")
                    last, run, level = events[sym2]
                    run += maxr[(last, level)] + 1
                    if br.read(1):
                        level = -level
                else:                   # type 3: FLC
                    last = br.read(1)
                    run = br.read(6)
                    br.read(1)
                    level = br.read(12)
                    if level >= 2048:
                        level -= 4096
                    br.read(1)
            else:
                last, run, level = events[sym]
                if br.read(1):
                    level = -level
            idx += run
            if idx > 63:
                raise InvalidData("mpeg4: run overflow")
            out[idx] = level
            idx += 1
            if last:
                break
        return out

    def _read_mv_component(self, br, fcode):
        code = _MV_VLC.read(br)
        if code == 0:
            return 0
        sign = br.read(1)
        if fcode > 1:
            resid = br.read(fcode - 1)
            val = ((code - 1) << (fcode - 1)) + resid + 1
        else:
            val = code
        return -val if sign else val

    # -- I-VOP ----------------------------------------------------------
    def _decode_i(self, br, qp, dc_thr):
        v = self.vol
        mb_w = (v.width + 15) // 16
        mb_h = (v.height + 15) // 16
        nbx, nby = mb_w * 2, mb_h * 2
        qy = np.zeros((nby, nbx, 64), np.int32)
        qu = np.zeros((mb_h, mb_w, 64), np.int32)
        qv = np.zeros((mb_h, mb_w, 64), np.int32)
        acpred = np.zeros((mb_h, mb_w), bool)
        qp_map = np.full((mb_h, mb_w), qp, np.int32)
        cur_qp = qp
        for my in range(mb_h):
            for mx in range(mb_w):
                sym = _INTRA_MCBPC_VLC.read(br)
                mbtype, cbpc = sym // 4, sym % 4
                ac = bool(br.read(1))
                acpred[my, mx] = ac
                cbpy = _CBPY_VLC.read(br)
                if mbtype == 1:         # intra+q
                    cur_qp = np.clip(cur_qp + (-1, -2, 1, 2)[br.read(2)],
                                     1, 31)
                qp_map[my, mx] = cur_qp
                use_dc = cur_qp < _DC_VLC_THR_CUTOFF[dc_thr]
                for i, (by, bx) in enumerate(
                        ((2 * my, 2 * mx), (2 * my, 2 * mx + 1),
                         (2 * my + 1, 2 * mx), (2 * my + 1, 2 * mx + 1))):
                    coded = cbpy & (8 >> i)
                    blk = np.zeros(64, np.int32)
                    if use_dc:
                        blk[0] = self._read_dc(br, False)
                        if coded:
                            rest = self._read_block_ac_only(br, True)
                            blk += rest
                    elif coded:
                        blk = self._read_block(br, True, False, False,
                                               cur_qp)
                    qy[by, bx] = blk
                for plane, arr, cb in ((0, qu, cbpc & 2), (1, qv, cbpc & 1)):
                    blk = np.zeros(64, np.int32)
                    if use_dc:
                        blk[0] = self._read_dc(br, True)
                        if cb:
                            blk += self._read_block_ac_only(br, True)
                    elif cb:
                        blk = self._read_block(br, True, False, True, cur_qp)
                    arr[my, mx] = blk
        return self._reconstruct_intra(qy, qu, qv, acpred, qp_map, dc_thr)

    def _read_block_ac_only(self, br, intra):
        """AC coefficients (scan positions 1..63) when DC came via DC VLC."""
        out = np.zeros(64, np.int32)
        idx = 1
        rl = _INTRA_RL_VLC if intra else _INTER_RL_VLC
        events = _INTRA_EVENTS if intra else _INTER_EVENTS
        maxl = _INTRA_MAXL if intra else _INTER_MAXL
        maxr = _INTRA_MAXR if intra else _INTER_MAXR
        while idx < 64:
            sym = rl.read(br)
            if sym == 102:
                if br.read(1) == 0:
                    sym2 = rl.read(br)
                    last, run, level = events[sym2]
                    level += maxl[(last, run)]
                    if br.read(1):
                        level = -level
                elif br.read(1) == 0:
                    sym2 = rl.read(br)
                    last, run, level = events[sym2]
                    run += maxr[(last, level)] + 1
                    if br.read(1):
                        level = -level
                else:
                    last = br.read(1)
                    run = br.read(6)
                    br.read(1)
                    level = br.read(12)
                    if level >= 2048:
                        level -= 4096
                    br.read(1)
            else:
                last, run, level = events[sym]
                if br.read(1):
                    level = -level
            idx += run
            if idx > 63:
                raise InvalidData("mpeg4: AC run overflow")
            out[idx] = level
            idx += 1
            if last:
                break
        return out

    # -- reconstruction -------------------------------------------------
    def _reconstruct_intra(self, qy, qu, qv, acpred, qp_map, dc_thr):
        v = self.vol
        planes = []
        for arr, chroma, qmap in ((qy, False, np.repeat(np.repeat(
                qp_map, 2, 0), 2, 1)), (qu, True, qp_map),
                (qv, True, qp_map)):
            planes.append(self._intra_plane(arr, chroma, qmap, acpred))
        return tuple(planes)

    def _intra_plane(self, q, chroma, qp_map, acpred_mb):
        """DC/AC prediction inverse + dequant + IDCT for one plane."""
        nby, nbx, _ = q.shape
        # expand ac_pred mask to block grid
        if chroma:
            acp = acpred_mb
        else:
            acp = np.repeat(np.repeat(acpred_mb, 2, 0), 2, 1)
        out_coef = np.zeros((nby, nbx, 64), np.int64)
        dc_store = np.full((nby + 1, nbx + 2), 1024, np.int64)
        ac_row = np.zeros((nby + 1, nbx + 2, 7), np.int64)
        ac_col = np.zeros((nby + 1, nbx + 2, 7), np.int64)
        from librempeg_tpu.codecs.jpeg.tables import ZIGZAG

        for by in range(nby):
            for bx in range(nbx):
                qp = int(qp_map[by, bx])
                scaler = T.dc_scaler(qp, chroma)
                blk = q[by, bx].astype(np.int64)
                A = dc_store[by + 1, bx]
                B = dc_store[by, bx]
                C = dc_store[by, bx + 1]
                from_c = abs(A - B) < abs(B - C)
                pred = C if from_c else A
                dc_level = blk[0] + (pred + scaler // 2) // scaler
                # AC prediction: first row from C or first col from A
                coefs = np.zeros(64, np.int64)
                if acp[by, bx]:
                    scan = _ALT_HORIZ if from_c else _ALT_VERT
                    coefs[scan] = blk
                    if from_c:
                        coefs[1:8] += ac_row[by, bx + 1]
                    else:
                        coefs[8::8][:7] += ac_col[by + 1, bx]
                else:
                    coefs[ZIGZAG] = blk
                coefs[0] = dc_level
                out_coef[by, bx] = coefs
                dc_store[by + 1, bx + 1] = dc_level * scaler
                ac_row[by + 1, bx + 1] = coefs[1:8]
                ac_col[by + 1, bx + 1] = coefs[8::8][:7]
        # dequant + idct (batched)
        return _dequant_idct_intra(out_coef, qp_map, chroma)

    # -- P-VOP ----------------------------------------------------------
    def _decode_p(self, br, qp, dc_thr, fcode, rounding):
        v = self.vol
        if self.ref is None:
            raise InvalidData("mpeg4: P-VOP without reference")
        mb_w = (v.width + 15) // 16
        mb_h = (v.height + 15) // 16
        ry, ru, rv = self.ref
        cur_qp = qp
        mvs = np.zeros((mb_h, mb_w, 4, 2), np.int32)   # halfpel, per 8x8
        intra_mask = np.zeros((mb_h, mb_w), bool)
        coded = np.zeros((mb_h, mb_w), bool)
        qy = np.zeros((mb_h * 2, mb_w * 2, 64), np.int32)
        qu = np.zeros((mb_h, mb_w, 64), np.int32)
        qv = np.zeros((mb_h, mb_w, 64), np.int32)
        acpred = np.zeros((mb_h, mb_w), bool)
        qp_map = np.full((mb_h, mb_w), qp, np.int32)
        valid = np.zeros((mb_h, mb_w), bool)

        for my in range(mb_h):
            for mx in range(mb_w):
                if br.read(1):          # not_coded: skip MB
                    valid[my, mx] = True
                    continue
                sym = _INTER_MCBPC_VLC.read(br)
                while sym == 20:        # stuffing
                    sym = _INTER_MCBPC_VLC.read(br)
                mbtype, cbpc = sym // 4, sym % 4
                coded[my, mx] = True
                valid[my, mx] = True
                is_intra = mbtype in (1, 3)
                intra_mask[my, mx] = is_intra
                ac = False
                if is_intra:
                    ac = bool(br.read(1))
                acpred[my, mx] = ac
                cbpy = _CBPY_VLC.read(br)
                if not is_intra:
                    cbpy = 15 - cbpy
                if mbtype in (2, 3):    # +q
                    cur_qp = int(np.clip(
                        cur_qp + (-1, -2, 1, 2)[br.read(2)], 1, 31))
                qp_map[my, mx] = cur_qp
                if not is_intra:
                    nmv = 4 if mbtype == 4 else 1
                    px, py = _mv_pred_p(mvs, valid, coded, intra_mask,
                                        my, mx, mb_w, 0)
                    for k in range(nmv):
                        if nmv == 4 and k:
                            px, py = _mv_pred_p(mvs, valid, coded,
                                                intra_mask, my, mx,
                                                mb_w, k)
                        dx = self._read_mv_component(br, fcode)
                        dy = self._read_mv_component(br, fcode)
                        rng = 32 << (fcode - 1)
                        vx = _mv_wrap(px + dx, rng)
                        vy = _mv_wrap(py + dy, rng)
                        if nmv == 1:
                            mvs[my, mx, :, 0] = vx
                            mvs[my, mx, :, 1] = vy
                        else:
                            mvs[my, mx, k, 0] = vx
                            mvs[my, mx, k, 1] = vy
                use_dc = cur_qp < _DC_VLC_THR_CUTOFF[dc_thr]
                for i, (by, bx) in enumerate(
                        ((2 * my, 2 * mx), (2 * my, 2 * mx + 1),
                         (2 * my + 1, 2 * mx), (2 * my + 1, 2 * mx + 1))):
                    cb = cbpy & (8 >> i)
                    blk = np.zeros(64, np.int32)
                    if is_intra:
                        if use_dc:
                            blk[0] = self._read_dc(br, False)
                            if cb:
                                blk += self._read_block_ac_only(br, True)
                        elif cb:
                            blk = self._read_block(br, True, False, False,
                                                   cur_qp)
                    elif cb:
                        blk = self._read_block(br, False, False, False,
                                               cur_qp)
                    qy[by, bx] = blk
                for arr, cb in ((qu, cbpc & 2), (qv, cbpc & 1)):
                    blk = np.zeros(64, np.int32)
                    if is_intra:
                        if use_dc:
                            blk[0] = self._read_dc(br, True)
                            if cb:
                                blk += self._read_block_ac_only(br, True)
                        elif cb:
                            blk = self._read_block(br, True, False, True,
                                                   cur_qp)
                    elif cb:
                        blk = self._read_block(br, False, False, True,
                                               cur_qp)
                    arr[my, mx] = blk
        return _reconstruct_p(self, qy, qu, qv, mvs, intra_mask, coded,
                              acpred, qp_map, dc_thr, rounding)


def _mv_wrap(v, rng):
    if v < -rng:
        return v + 2 * rng
    if v >= rng:
        return v - 2 * rng
    return v


def _mv_pred_p(mvs, valid, coded, intra, my, mx, mb_w, blk):
    """Median predictor for P-VOP MVs (1MV: blk 0; 4MV per spec)."""

    def get(yy, xx, k):
        if yy < 0 or xx < 0 or xx >= mb_w or not valid[yy, xx]:
            return None
        if intra[yy, xx]:
            return (0, 0)
        return (int(mvs[yy, xx, k, 0]), int(mvs[yy, xx, k, 1]))

    if blk == 0:
        A = get(my, mx - 1, 1)
        B = get(my - 1, mx, 2)
        C = get(my - 1, mx + 1, 2)
    elif blk == 1:
        A = (int(mvs[my, mx, 0, 0]), int(mvs[my, mx, 0, 1]))
        B = get(my - 1, mx, 3)
        C = get(my - 1, mx + 1, 2)
    elif blk == 2:
        A = get(my, mx - 1, 3)
        B = (int(mvs[my, mx, 0, 0]), int(mvs[my, mx, 0, 1]))
        C = (int(mvs[my, mx, 1, 0]), int(mvs[my, mx, 1, 1]))
    else:
        A = (int(mvs[my, mx, 2, 0]), int(mvs[my, mx, 2, 1]))
        B = (int(mvs[my, mx, 0, 0]), int(mvs[my, mx, 0, 1]))
        C = (int(mvs[my, mx, 1, 0]), int(mvs[my, mx, 1, 1]))
    cands = [c for c in (A, B, C)]
    if blk == 0 and B is None and C is None:
        return A if A is not None else (0, 0)
    cands = [(0, 0) if c is None else c for c in cands]
    px = int(np.median([c[0] for c in cands]))
    py = int(np.median([c[1] for c in cands]))
    return px, py


# ---------------------------------------------------------------------------
# Pixel reconstruction (vectorized numpy; device variant plugs in here)
# ---------------------------------------------------------------------------


def _h263_dequant(levels: np.ndarray, qp: np.ndarray) -> np.ndarray:
    """H.263 inverse quant; levels [..., 64], qp broadcastable."""
    odd = qp % 2
    mag = qp * (2 * np.abs(levels) + 1) - (1 - odd)
    return np.where(levels != 0, np.sign(levels) * mag, 0)


def _idct_f(blocks64: np.ndarray) -> np.ndarray:
    """IDCT over [..., 64] raster coeffs with the reference decoder's
    simple_idct 8-bit numeric contract (row DC shortcut, int16 row
    storage) -- the float spec IDCT rounds a small fraction of samples
    differently, breaking bit-exactness against the reference."""
    from librempeg_tpu.codecs.mpeg12.decoder import idct_simple

    return idct_simple(
        blocks64.reshape(*blocks64.shape[:-1], 8, 8)).astype(np.float64)


def _dequant_idct_intra(coefs, qp_map, chroma):
    nby, nbx, _ = coefs.shape
    qp = qp_map[..., None]
    deq = _h263_dequant(coefs, qp).astype(np.float64)
    scaler = np.vectorize(lambda q: T.dc_scaler(int(q), chroma))(qp_map)
    deq[..., 0] = coefs[..., 0] * scaler
    pix = np.clip(np.rint(_idct_f(deq)), 0, 255).astype(np.uint8)
    out = pix.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
    return out


def _hpel_mc(ref: np.ndarray, oy, ox, size, rounding):
    """Half-pel block fetch with integer-exact averaging."""
    iy, fy = oy >> 1, oy & 1
    ix, fx = ox >> 1, ox & 1
    r = 1 - rounding
    a = ref[iy:iy + size + 1, ix:ix + size + 1].astype(np.int32)
    if fy == 0 and fx == 0:
        return a[:size, :size]
    if fy == 0:
        return (a[:size, :size] + a[:size, 1:size + 1] + r) >> 1
    if fx == 0:
        return (a[:size, :size] + a[1:size + 1, :size] + r) >> 1
    return (a[:size, :size] + a[:size, 1:size + 1]
            + a[1:size + 1, :size] + a[1:size + 1, 1:size + 1]
            + 2 - rounding) >> 2


def _chroma_mv(mv: int, nmv: int = 1) -> int:
    """Luma->chroma MV (half-pel units): 1MV uses the x/2-with-sticky-
    half rule (spec §7.6.2.2: cmv = mv/2, any remainder rounds to the
    half-pel position)."""
    sign = -1 if mv < 0 else 1
    a = abs(mv)
    return sign * ((a >> 1) | (a & 1))


def _div_round_half(a: int) -> int:
    """|sum of 4 luma halfpel mvs| -> chroma halfpel (spec Table 7-8:
    /8 with remainder 0 -> 0, 1..7 biased to the half position)."""
    q, r = divmod(a, 16)
    if r == 0:
        frac = 0
    elif r < 14:
        frac = 1
    else:
        frac = 2
    return q * 2 + frac


def _reconstruct_p(dec, qy, qu, qv, mvs, intra_mask, coded_mask, acpred,
                   qp_map, dc_thr, rounding):
    v = dec.vol
    ry, ru, rv = dec.ref
    mb_h, mb_w = qp_map.shape
    H, W = mb_h * 16, mb_w * 16
    pad = 32
    ryp = np.pad(ry, pad, mode="edge")
    rup = np.pad(ru, pad, mode="edge")
    rvp = np.pad(rv, pad, mode="edge")
    out_y = np.zeros((H, W), np.uint8)
    out_u = np.zeros((H // 2, W // 2), np.uint8)
    out_v = np.zeros((H // 2, W // 2), np.uint8)
    from librempeg_tpu.codecs.jpeg.tables import ZIGZAG

    for my in range(mb_h):
        for mx in range(mb_w):
            qp = int(qp_map[my, mx])
            if intra_mask[my, mx]:
                # standalone intra MB in P-VOP: no prediction from
                # neighbors (treated as out-of-bounds -> 1024 default)
                for i, (by, bx) in enumerate(
                        ((0, 0), (0, 1), (1, 0), (1, 1))):
                    blk = qy[2 * my + by, 2 * mx + bx].astype(np.int64)
                    coefs = np.zeros(64, np.int64)
                    coefs[ZIGZAG] = blk
                    scaler = T.dc_scaler(qp, False)
                    coefs[0] = blk[0] + (1024 + scaler // 2) // scaler
                    deq = _h263_dequant(coefs, np.int64(qp)).astype(
                        np.float64)
                    deq[0] = coefs[0] * scaler
                    pix = np.clip(np.rint(_idct_f(deq)), 0, 255)
                    out_y[my * 16 + by * 8:my * 16 + by * 8 + 8,
                          mx * 16 + bx * 8:mx * 16 + bx * 8 + 8] = pix
                for arr, outp in ((qu, out_u), (qv, out_v)):
                    blk = arr[my, mx].astype(np.int64)
                    coefs = np.zeros(64, np.int64)
                    coefs[ZIGZAG] = blk
                    scaler = T.dc_scaler(qp, True)
                    coefs[0] = blk[0] + (1024 + scaler // 2) // scaler
                    deq = _h263_dequant(coefs, np.int64(qp)).astype(
                        np.float64)
                    deq[0] = coefs[0] * scaler
                    pix = np.clip(np.rint(_idct_f(deq)), 0, 255)
                    outp[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = pix
                continue
            # inter (or skipped): motion compensate
            for k, (by, bx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
                vx = int(mvs[my, mx, k, 0])
                vy = int(mvs[my, mx, k, 1])
                oy = (my * 16 + by * 8 + pad) * 2 + vy
                ox = (mx * 16 + bx * 8 + pad) * 2 + vx
                pred = _hpel_mc(ryp, oy, ox, 8, rounding)
                blk = qy[2 * my + by, 2 * mx + bx]
                if np.any(blk):
                    coefs = np.zeros(64, np.int64)
                    coefs[ZIGZAG] = blk
                    resid = _idct_f(_h263_dequant(coefs, np.int64(qp))
                                    .astype(np.float64))
                    pred = pred + np.rint(resid).astype(np.int32)
                out_y[my * 16 + by * 8:my * 16 + by * 8 + 8,
                      mx * 16 + bx * 8:mx * 16 + bx * 8 + 8] = \
                    np.clip(pred, 0, 255)
            sx = sum(int(mvs[my, mx, k, 0]) for k in range(4))
            sy = sum(int(mvs[my, mx, k, 1]) for k in range(4))
            if np.all(mvs[my, mx, 1:] == mvs[my, mx, 0]):
                cvx = _chroma_mv(int(mvs[my, mx, 0, 0]), 1)
                cvy = _chroma_mv(int(mvs[my, mx, 0, 1]), 1)
            else:
                cvx = _div_round_half(abs(sx)) * (1 if sx >= 0 else -1)
                cvy = _div_round_half(abs(sy)) * (1 if sy >= 0 else -1)
            for arr, refp, outp in ((qu, rup, out_u), (qv, rvp, out_v)):
                oy = (my * 8 + pad) * 2 + cvy
                ox = (mx * 8 + pad) * 2 + cvx
                pred = _hpel_mc(refp, oy, ox, 8, rounding)
                blk = arr[my, mx]
                if np.any(blk):
                    coefs = np.zeros(64, np.int64)
                    coefs[ZIGZAG] = blk
                    resid = _idct_f(_h263_dequant(coefs, np.int64(qp))
                                    .astype(np.float64))
                    pred = pred + np.rint(resid).astype(np.int32)
                outp[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = \
                    np.clip(pred, 0, 255)
    return out_y, out_u, out_v


@register_decoder
class Mpeg4Decoder(Decoder):
    INFO = CodecInfo(name="mpeg4", long_name="MPEG-4 part 2",
                     codec_type="video")

    def __init__(self, params=None, **opts):
        self._dec = Mpeg4BitstreamDecoder()
        self._n = 0
        super().__init__(params, **opts)

    def configure(self, params):
        if params.extradata:
            # VOL headers may live in extradata (mp4 esds)
            self._dec.decode_frame(bytes(params.extradata))

    def decode(self, pkt: Packet):
        out = self._dec.decode_frame(bytes(pkt.data))
        if out is None:
            return []
        y, u, v = out
        vol = self._dec.vol
        f = VideoFrame(
            planes=(y[:vol.height, :vol.width],
                    u[:(vol.height + 1) // 2, :(vol.width + 1) // 2],
                    v[:(vol.height + 1) // 2, :(vol.width + 1) // 2]),
            format="yuv420p", width=vol.width, height=vol.height,
            pts=pkt.pts,
            time_base=pkt.time_base if pkt.time_base.valid
            and pkt.time_base.num else Rational(1, 25))
        self._n += 1
        return [f]
