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
    low_delay = True      # vol_control_parameters low_delay (default 1)


def _next_start_code(data: bytes, pos: int) -> int:
    i = data.find(b"\x00\x00\x01", pos)
    return i if i >= 0 else len(data)


class Mpeg4BitstreamDecoder:
    """Stateful stream decoder (host entropy layer)."""

    def __init__(self):
        self.vol = None
        self.ref = None        # newest non-B reference planes
        self.prev_ref = None   # older non-B reference (B forward ref)
        self.co_info = None    # colocated P info: (mvs, skip, is8x8)
        # VOP timing for B direct mode (TRB/TRD)
        self.time_base = 0
        self.last_time_base = 0
        self.last_non_b_time = 0
        self.pp_time = 0
        self.pb_time = 0
        self.last_was_b = False

    # -- headers ------------------------------------------------------
    def _parse_vol(self, br: BitReaderMSB):
        v = _VolInfo()
        br.read(1)                      # random_accessible
        br.read(8)                      # object type
        ver_id = 1
        if br.read(1):                  # is_object_layer_identifier
            ver_id = br.read(4)
            br.read(3)
        aspect = br.read(4)
        if aspect == 15:
            br.read(8)
            br.read(8)
        if br.read(1):                  # vol_control_parameters
            br.read(2)                  # chroma format
            v.low_delay = bool(br.read(1))
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
        # sprite_enable: 1 bit in v1 VOLs, 2 bits from vo_ver_id 2
        if br.read(1 if ver_id == 1 else 2):
            raise Unsupported("mpeg4: sprites/GMC")
        if br.read(1):                  # not_8_bit
            raise Unsupported("mpeg4: extended bit depth")
        v.quant_type = br.read(1)
        if v.quant_type:
            raise Unsupported("mpeg4: MPEG quantization matrices")
        if ver_id != 1 and br.read(1):  # quarter_sample
            raise Unsupported("mpeg4: quarter-pel motion")
        if not br.read(1):              # complexity_estimation_disable
            raise Unsupported("mpeg4: complexity estimation headers")
        v.resync_disable = bool(br.read(1))
        if br.read(1):                  # data_partitioned
            raise Unsupported("mpeg4: data partitioning")
        if ver_id != 1:
            if br.read(1):              # newpred_enable
                raise Unsupported("mpeg4: newpred")
            if br.read(1):              # reduced_resolution_vop
                raise Unsupported("mpeg4: reduced resolution")
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
        time_incr = 0
        while br.read(1):               # modulo_time_base
            time_incr += 1
        br.read(1)
        time_increment = br.read(v.inc_bits)
        # VOP time bookkeeping for B-frame direct mode (TRB/TRD;
        # mpeg4videodec.c:3120)
        if ctype != 2:
            self.last_time_base = self.time_base
            self.time_base += time_incr
            time = self.time_base * v.time_res + time_increment
            self.pp_time = time - self.last_non_b_time
            self.last_non_b_time = time
        else:
            time = (self.last_time_base + time_incr) * v.time_res \
                + time_increment
            self.pb_time = self.pp_time - (self.last_non_b_time - time)
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
        bcode = 1
        if ctype == 1:
            fcode = br.read(3)
        elif ctype == 2:
            fcode = br.read(3)
            bcode = br.read(3)
        self.last_was_b = ctype == 2
        if ctype == 0:
            out = self._decode_i(br, qp, dc_thr)
            self._promote_ref(out, None)
        elif ctype == 1:
            out = self._decode_p(br, qp, dc_thr, fcode, rounding)
        elif ctype == 2:
            out = self._decode_b(br, qp, dc_thr, fcode, bcode)
        else:
            raise Unsupported("mpeg4: S(GMC)-VOPs")
        return out

    def _promote_ref(self, out, co_info):
        self.prev_ref = self.ref
        self.ref = out
        self.co_info = co_info

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
        grids = _new_pred_grids(nby, nbx)
        for by in range(nby):
            for bx in range(nbx):
                out_coef[by, bx] = _predict_intra_block(
                    q[by, bx], grids, by, bx, int(qp_map[by, bx]),
                    chroma, bool(acp[by, bx]))
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
        skip = np.zeros((mb_h, mb_w), bool)
        is8x8 = np.zeros((mb_h, mb_w), bool)

        for my in range(mb_h):
            for mx in range(mb_w):
                if br.read(1):          # not_coded: skip MB
                    valid[my, mx] = True
                    skip[my, mx] = True
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
                    is8x8[my, mx] = nmv == 4
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
        out = _reconstruct_p(self, qy, qu, qv, mvs, intra_mask, coded,
                             acpred, qp_map, dc_thr, rounding)
        self._promote_ref(out, (mvs, skip, is8x8))
        return out

    def _decode_b(self, br, qp, dc_thr, fcode, bcode):
        """B-VOP: direct/interpolate/backward/forward 16x16 MBs
        (mpeg4videodec.c:1888; progressive only)."""
        v = self.vol
        if self.ref is None or self.prev_ref is None:
            raise InvalidData("mpeg4: B-VOP without two references")
        if v.interlaced:
            raise Unsupported("mpeg4: interlaced B-VOPs")
        mb_w = (v.width + 15) // 16
        mb_h = (v.height + 15) // 16
        if self.co_info is not None:
            co_mvs, co_skip, co_8x8 = self.co_info
        else:                           # backward ref is an I-VOP
            co_mvs = np.zeros((mb_h, mb_w, 4, 2), np.int32)
            co_skip = np.zeros((mb_h, mb_w), bool)
            co_8x8 = np.zeros((mb_h, mb_w), bool)
        time_pp = self.pp_time
        time_pb = self.pb_time
        cur_qp = qp
        mbs = []
        qy = np.zeros((mb_h * 2, mb_w * 2, 64), np.int32)
        qu = np.zeros((mb_h, mb_w, 64), np.int32)
        qv = np.zeros((mb_h, mb_w, 64), np.int32)
        frng = 32 << (fcode - 1)
        brng = 32 << (bcode - 1)
        for my in range(mb_h):
            last_f = (0, 0)
            last_b = (0, 0)
            for mx in range(mb_w):
                mb = _BMb()
                mb.qp = cur_qp
                mbs.append(mb)
                # colocated-skip in the future P skips the B MB too
                if co_skip[my, mx]:
                    mb.skip = True
                    mb.mode = _B_FORWARD
                    mb.mvf = [(0, 0)] * 4
                    continue
                modb1 = br.read(1)
                direct_delta = (0, 0)
                cbp = 0
                if modb1:
                    mb.mode = _B_DIRECT
                else:
                    modb2 = br.read(1)
                    mb.mode = _read_b_mbtype(br)
                    if not modb2:
                        cbp = br.read(6)
                    if mb.mode != _B_DIRECT and cbp:
                        if br.read(1):  # dbquant
                            cur_qp = int(np.clip(
                                cur_qp + (br.read(1) * 4 - 2), 1, 31))
                    mb.qp = cur_qp
                    if mb.mode in (_B_FORWARD, _B_BIDIR):
                        dx = self._read_mv_component(br, fcode)
                        dy = self._read_mv_component(br, fcode)
                        vx = _mv_wrap(last_f[0] + dx, frng)
                        vy = _mv_wrap(last_f[1] + dy, frng)
                        last_f = (vx, vy)
                        mb.mvf = [(vx, vy)] * 4
                    if mb.mode in (_B_BACKWARD, _B_BIDIR):
                        dx = self._read_mv_component(br, bcode)
                        dy = self._read_mv_component(br, bcode)
                        vx = _mv_wrap(last_b[0] + dx, brng)
                        vy = _mv_wrap(last_b[1] + dy, brng)
                        last_b = (vx, vy)
                        mb.mvb = [(vx, vy)] * 4
                    if mb.mode == _B_DIRECT:
                        dx = self._read_mv_component(br, 1)
                        dy = self._read_mv_component(br, 1)
                        direct_delta = (_mv_wrap(dx, 32),
                                        _mv_wrap(dy, 32))
                if mb.mode == _B_DIRECT:
                    # scale colocated MVs by TRB/TRD (mpeg4video.c:83)
                    mb.co8 = bool(co_8x8[my, mx])
                    nblk = 4 if mb.co8 else 1
                    mvf, mvb = [], []
                    dmx, dmy = direct_delta
                    for k in range(nblk):
                        pmx = int(co_mvs[my, mx, k, 0])
                        pmy = int(co_mvs[my, mx, k, 1])
                        fx = _ctrunc_div(pmx * time_pb, time_pp) + dmx
                        fy = _ctrunc_div(pmy * time_pb, time_pp) + dmy
                        bx = fx - pmx if dmx else _ctrunc_div(
                            pmx * (time_pb - time_pp), time_pp)
                        by = fy - pmy if dmy else _ctrunc_div(
                            pmy * (time_pb - time_pp), time_pp)
                        mvf.append((fx, fy))
                        mvb.append((bx, by))
                    if nblk == 1:
                        mvf, mvb = mvf * 4, mvb * 4
                    mb.mvf, mb.mvb = mvf, mvb
                # residual blocks (inter coding only)
                for i, (by, bx) in enumerate(
                        ((2 * my, 2 * mx), (2 * my, 2 * mx + 1),
                         (2 * my + 1, 2 * mx), (2 * my + 1, 2 * mx + 1))):
                    if cbp & (32 >> i):
                        qy[by, bx] = self._read_block(
                            br, False, False, False, mb.qp)
                if cbp & 2:
                    qu[my, mx] = self._read_block(br, False, False,
                                                  True, mb.qp)
                if cbp & 1:
                    qv[my, mx] = self._read_block(br, False, False,
                                                  True, mb.qp)
        return _reconstruct_b(self, mbs, qy, qu, qv, mb_w, mb_h)


def _ctrunc_div(a: int, b: int) -> int:
    """C-style integer division (truncate toward zero), b > 0."""
    q = abs(a) // b
    return q if a >= 0 else -q


# B-VOP macroblock modes (mb_type VLC '1','01','001','0001';
# mpeg4videodec.c mb_type_b_map order)
_B_DIRECT, _B_BIDIR, _B_BACKWARD, _B_FORWARD = range(4)


class _BMb:
    __slots__ = ("mode", "mvf", "mvb", "skip", "co8", "qp")

    def __init__(self):
        self.mode = _B_FORWARD
        self.mvf = [(0, 0)] * 4
        self.mvb = [(0, 0)] * 4
        self.skip = False
        self.co8 = False
        self.qp = 0


def _read_b_mbtype(br) -> int:
    for n in range(4):
        if br.read(1):
            return (_B_DIRECT, _B_BIDIR, _B_BACKWARD, _B_FORWARD)[n]
    raise InvalidData("mpeg4: illegal B mb_type")


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
        if my == 0:                     # first line: pred = A alone
            return A if A is not None else (0, 0)
    elif blk == 1:
        A = (int(mvs[my, mx, 0, 0]), int(mvs[my, mx, 0, 1]))
        B = get(my - 1, mx, 3)
        C = get(my - 1, mx + 1, 2)
        if my == 0:                     # first line (h263.c:213)
            return A
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


def _new_pred_grids(nby, nbx):
    """DC/AC prediction state: (dc, ac_row, ac_col); inter blocks keep
    the 1024/0 reset values (the reference's dc_val/ac_val handling)."""
    return (np.full((nby + 1, nbx + 2), 1024, np.int64),
            np.zeros((nby + 1, nbx + 2, 7), np.int64),
            np.zeros((nby + 1, nbx + 2, 7), np.int64))


def _predict_intra_block(blk_scan, grids, by, bx, qp, chroma,
                         acpred):
    """Inverse DC/AC prediction for one intra block (§7.4.3); returns
    raster-order quantized coefficients and updates the grids."""
    from librempeg_tpu.codecs.jpeg.tables import ZIGZAG

    dc_store, ac_row, ac_col = grids
    scaler = T.dc_scaler(qp, chroma)
    blk = blk_scan.astype(np.int64)
    A = dc_store[by + 1, bx]
    B = dc_store[by, bx]
    C = dc_store[by, bx + 1]
    from_c = abs(A - B) < abs(B - C)
    pred = C if from_c else A
    dc_level = blk[0] + (pred + scaler // 2) // scaler
    coefs = np.zeros(64, np.int64)
    if acpred:
        scan = _ALT_HORIZ if from_c else _ALT_VERT
        coefs[scan] = blk
        if from_c:
            coefs[1:8] += ac_row[by, bx + 1]
        else:
            coefs[8::8][:7] += ac_col[by + 1, bx]
    else:
        coefs[ZIGZAG] = blk
    coefs[0] = dc_level
    dc_store[by + 1, bx + 1] = dc_level * scaler
    ac_row[by + 1, bx + 1] = coefs[1:8]
    ac_col[by + 1, bx + 1] = coefs[8::8][:7]
    return coefs


def _wrap16(x):
    """int16 storage wrap: the reference keeps dequantized coefficients
    in int16_t blocks, so large escapes at high qp wrap around."""
    return ((x.astype(np.int64) + 32768) & 65535) - 32768


def _h263_dequant(levels: np.ndarray, qp: np.ndarray) -> np.ndarray:
    """H.263 inverse quant; levels [..., 64], qp broadcastable."""
    odd = qp % 2
    mag = qp * (2 * np.abs(levels) + 1) - (1 - odd)
    return _wrap16(np.where(levels != 0, np.sign(levels) * mag, 0))


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
    deq[..., 0] = _wrap16(coefs[..., 0] * scaler)
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


# sum of 4 luma halfpel MVs -> chroma halfpel (spec Table 7-8 as the
# reference's h263_chroma_roundtab realizes it, h263.c)
_CHROMA_ROUNDTAB = (0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2)


def _chroma_mv_4(s: int) -> int:
    return _CHROMA_ROUNDTAB[s & 0xF] + ((s >> 3) & ~1)


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

    # DC/AC prediction state for standalone intra MBs (neighbors that
    # are inter/skipped read as the 1024/0 reset values, mirroring the
    # reference's per-frame dc_val/ac_val tables)
    grids_y = _new_pred_grids(mb_h * 2, mb_w * 2)
    grids_u = _new_pred_grids(mb_h, mb_w)
    grids_v = _new_pred_grids(mb_h, mb_w)

    for my in range(mb_h):
        for mx in range(mb_w):
            qp = int(qp_map[my, mx])
            if intra_mask[my, mx]:
                acp = bool(acpred[my, mx])
                for i, (by, bx) in enumerate(
                        ((0, 0), (0, 1), (1, 0), (1, 1))):
                    coefs = _predict_intra_block(
                        qy[2 * my + by, 2 * mx + bx], grids_y,
                        2 * my + by, 2 * mx + bx, qp, False, acp)
                    scaler = T.dc_scaler(qp, False)
                    deq = _h263_dequant(coefs, np.int64(qp)).astype(
                        np.float64)
                    deq[0] = _wrap16(np.asarray(coefs[0] * scaler))
                    pix = np.clip(np.rint(_idct_f(deq)), 0, 255)
                    out_y[my * 16 + by * 8:my * 16 + by * 8 + 8,
                          mx * 16 + bx * 8:mx * 16 + bx * 8 + 8] = pix
                for arr, outp, grids in ((qu, out_u, grids_u),
                                         (qv, out_v, grids_v)):
                    coefs = _predict_intra_block(
                        arr[my, mx], grids, my, mx, qp, True, acp)
                    scaler = T.dc_scaler(qp, True)
                    deq = _h263_dequant(coefs, np.int64(qp)).astype(
                        np.float64)
                    deq[0] = _wrap16(np.asarray(coefs[0] * scaler))
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
                cvx = _chroma_mv_4(sx)
                cvy = _chroma_mv_4(sy)
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


def _reconstruct_b(dec, mbs, qy, qu, qv, mb_w, mb_h):
    """B-VOP reconstruction: fwd/bwd/averaged half-pel MC + inter
    residuals (rounding type 0 throughout, as the reference uses for
    B-frames)."""
    fy_, fu_, fv_ = dec.prev_ref            # forward (older) ref
    by_, bu_, bv_ = dec.ref                 # backward (future P) ref
    pad = 32
    planes = {
        0: (np.pad(fy_, pad, mode="edge"), np.pad(by_, pad, mode="edge")),
        1: (np.pad(fu_, pad, mode="edge"), np.pad(bu_, pad, mode="edge")),
        2: (np.pad(fv_, pad, mode="edge"), np.pad(bv_, pad, mode="edge")),
    }
    H, W = mb_h * 16, mb_w * 16
    out_y = np.zeros((H, W), np.uint8)
    out_u = np.zeros((H // 2, W // 2), np.uint8)
    out_v = np.zeros((H // 2, W // 2), np.uint8)
    from librempeg_tpu.codecs.jpeg.tables import ZIGZAG

    def pred8(plane_idx, py, px, mvs_f, mvs_b, mode):
        fwd, bwd = planes[plane_idx]
        if mode in (_B_FORWARD, _B_BIDIR, _B_DIRECT):
            p = _hpel_mc(fwd, (py + pad) * 2 + mvs_f[1],
                         (px + pad) * 2 + mvs_f[0], 8, 0)
        if mode == _B_BACKWARD:
            return _hpel_mc(bwd, (py + pad) * 2 + mvs_b[1],
                            (px + pad) * 2 + mvs_b[0], 8, 0)
        if mode in (_B_BIDIR, _B_DIRECT):
            q = _hpel_mc(bwd, (py + pad) * 2 + mvs_b[1],
                         (px + pad) * 2 + mvs_b[0], 8, 0)
            return (p + q + 1) >> 1
        return p

    def add_residual(pred, blk, qp):
        if np.any(blk):
            coefs = np.zeros(64, np.int64)
            coefs[ZIGZAG] = blk
            resid = _idct_f(_h263_dequant(coefs, np.int64(qp))
                            .astype(np.float64))
            pred = pred + np.rint(resid).astype(np.int32)
        return np.clip(pred, 0, 255)

    for my in range(mb_h):
        for mx in range(mb_w):
            mb = mbs[my * mb_w + mx]
            mode = mb.mode
            for k, (oy, ox) in enumerate(((0, 0), (0, 8), (8, 0),
                                          (8, 8))):
                p = pred8(0, my * 16 + oy, mx * 16 + ox,
                          mb.mvf[k], mb.mvb[k], mode)
                out_y[my * 16 + oy:my * 16 + oy + 8,
                      mx * 16 + ox:mx * 16 + ox + 8] = add_residual(
                    p, qy[2 * my + (oy >> 3), 2 * mx + (ox >> 3)],
                    mb.qp)
            # chroma MVs per direction
            def cmv(mvlist):
                if mb.mode == _B_DIRECT and mb.co8:
                    sx = sum(m[0] for m in mvlist)
                    sy = sum(m[1] for m in mvlist)
                    return (_chroma_mv_4(sx), _chroma_mv_4(sy))
                return (_chroma_mv(mvlist[0][0]),
                        _chroma_mv(mvlist[0][1]))

            cf = cmv(mb.mvf)
            cb = cmv(mb.mvb)
            for pi, (arr, outp) in ((1, (qu, out_u)), (2, (qv, out_v))):
                p = pred8(pi, my * 8, mx * 8, cf, cb, mode)
                outp[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = \
                    add_residual(p, arr[my, mx], mb.qp)
    return out_y, out_u, out_v


@register_decoder
class Mpeg4Decoder(Decoder):
    INFO = CodecInfo(name="mpeg4", long_name="MPEG-4 part 2",
                     codec_type="video")

    def __init__(self, params=None, **opts):
        self._dec = Mpeg4BitstreamDecoder()
        self._n = 0
        self._held = None       # reordering: non-B frames delay by one
        self._seen_b = False
        super().__init__(params, **opts)

    def configure(self, params):
        if params.extradata:
            # VOL headers may live in extradata (mp4 esds)
            self._dec.decode_frame(bytes(params.extradata))

    def _frame(self, out, pkt):
        y, u, v = out
        vol = self._dec.vol
        self._n += 1
        return VideoFrame(
            planes=(y[:vol.height, :vol.width],
                    u[:(vol.height + 1) // 2, :(vol.width + 1) // 2],
                    v[:(vol.height + 1) // 2, :(vol.width + 1) // 2]),
            format="yuv420p", width=vol.width, height=vol.height,
            pts=pkt.pts,
            time_base=pkt.time_base if pkt.time_base.valid
            and pkt.time_base.num else Rational(1, 25))

    def decode(self, pkt: Packet):
        out = self._dec.decode_frame(bytes(pkt.data))
        if out is None:
            return []
        f = self._frame(out, pkt)
        if self._dec.last_was_b:
            # B frames display immediately (between the held refs);
            # a B in a stream claiming low_delay means the flag lies
            # (mpeg4videodec.c "low_delay flag set incorrectly") --
            # switch to reordered output from here on
            self._seen_b = True
            return [f]
        if self._dec.vol is not None and self._dec.vol.low_delay \
                and not self._seen_b:
            # low-delay stream: no output delay
            return [f]
        # non-B frames are held one step for display reordering (the
        # reference's has_b_frames=1 output delay); flush() drains
        held, self._held = self._held, f
        return [held] if held is not None else []

    def flush(self):
        held, self._held = self._held, None
        return [held] if held is not None else []
