"""Sweep planner: expand the reference's four `setting_*` dicts into an
ordered list of degradation specs with bit-compatible result keys.

Key-naming and quirk parity (SURVEY §7 'preserve'):
- cutoff values arrive already doubled by the helper's `_cutoff2sr`
  (reference eval.py:121-126); keys embed the doubled value.
- a cutoff equal to the sample rate is decremented by 1 *for that entry*
  (eval.py:338-339,404-405,414-415) and the decremented value appears in
  the key.
- filter order is clamped to [2, 10] at application time (lowpass.py:147-153)
  but the key shows the unclamped order (eval.py:340).
- family order matches `preprocess`'s dict-update order: butter, cheby,
  ellip, bessel, subsampling, mp3, fft (eval.py:244-269).
- keys: proc_bw_<c>_<o>_<sr>, proc_ch_..., proc_el_..., proc_bessel_...,
  proc_subsampling_<c>_<sr>, proc_mp3_<kbps>_<sr>, proc_fft_<c>_<sr>.
"""

from __future__ import annotations

from typing import NamedTuple, Optional


class DegradationSpec(NamedTuple):
    key: str            # result-JSON key (bit-compatible with the reference)
    family: str         # fft | iir | subsampling | mp3
    ftype: Optional[str]  # butter/cheby1/ellip/bessel for iir
    cutoff: int         # doubled "low rate" (after possible -1)
    order: int          # unclamped order (0 where n/a)
    sr: int             # model input sample rate
    kbps: int = 0       # mp3 bitrate (mp3 family only)

    @property
    def highcut(self) -> int:
        return self.cutoff // 2

    @property
    def clamped_order(self) -> int:
        return max(2, min(10, self.order))

    @property
    def lowpass_ratio(self) -> float:
        return self.highcut / int(self.sr / 2)


def _dec(cutoff: int, sr: int) -> int:
    return cutoff - 1 if cutoff == sr else cutoff


def expand_settings(
    setting_lowpass_filtering=None,
    setting_subsampling=None,
    setting_fft=None,
    setting_mp3_compression=None,
    sr: int = 44100,
):
    """-> ordered [DegradationSpec]; settings carry already-doubled cutoffs."""
    specs = []
    lp = setting_lowpass_filtering
    if lp is not None:
        fams = []
        # Substring dispatch parity with `preprocess` (eval.py:244-262).
        if "butter" in lp["filter"]:
            fams.append(("butter", "bw"))
        if "cheby" in lp["filter"]:
            fams.append(("cheby1", "ch"))
        if "ellip" in lp["filter"]:
            fams.append(("ellip", "el"))
        if "bessel" in lp["filter"]:
            fams.append(("bessel", "bessel"))
        for ftype, tag in fams:
            for c in lp["cutoff_freq"]:
                for order in lp["filter_order"]:
                    cc = _dec(c, sr)
                    specs.append(
                        DegradationSpec(
                            key=f"proc_{tag}_{cc}_{order}_{sr}",
                            family="iir",
                            ftype=ftype,
                            cutoff=cc,
                            order=order,
                            sr=sr,
                        )
                    )
    if setting_subsampling is not None:
        for c in setting_subsampling["cutoff_freq"]:
            cc = _dec(c, sr)
            specs.append(
                DegradationSpec(
                    key=f"proc_subsampling_{cc}_{sr}",
                    family="subsampling",
                    ftype=None,
                    cutoff=cc,
                    order=1,
                    sr=sr,
                )
            )
    if setting_mp3_compression is not None:
        for kbps in setting_mp3_compression["low_kbps"]:
            specs.append(
                DegradationSpec(
                    key=f"proc_mp3_{kbps}_{sr}",
                    family="mp3",
                    ftype=None,
                    cutoff=0,
                    order=0,
                    sr=sr,
                    kbps=kbps,
                )
            )
    if setting_fft is not None:
        for c in setting_fft["cutoff_freq"]:
            cc = _dec(c, sr)
            specs.append(
                DegradationSpec(
                    key=f"proc_fft_{cc}_{sr}",
                    family="fft",
                    ftype=None,
                    cutoff=cc,
                    order=1,
                    sr=sr,
                )
            )
    return specs
