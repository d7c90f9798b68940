"""Plot surface (utils/splot.py ≙ src/io/siril_plot.c)."""

import os

import numpy as np

from siril_tpu.utils.splot import SirilPlot


def test_png_and_dat(tmp_path):
    p = SirilPlot(title="Light curve", xlabel="JD", ylabel="mag",
                  revertY=True)
    x = np.linspace(2460000.0, 2460000.5, 30)
    y = 12.0 + 0.1 * np.sin(x * 40)
    p.add_xyerrdata("V-C", x, y, np.full(30, 0.02))
    p.add_xydata("model", x, 12.0 + 0.1 * np.sin(x * 40), kind="line")
    p.sort_x()
    png = str(tmp_path / "lc.png")
    dat = str(tmp_path / "lc.dat")
    p.save_png(png)
    p.save_dat(dat)

    from PIL import Image

    im = Image.open(png)
    assert im.size == (800, 600)
    arr = np.asarray(im)
    # something other than white background was drawn
    assert (arr < 200).any()
    lines = open(dat).read().splitlines()
    assert lines[0].startswith("#")
    assert len(lines) == 31
    assert len(lines[1].split()) == 5        # x1, y1, err1, x2, y2


def test_empty_series_png(tmp_path):
    p = SirilPlot(title="empty")
    p.save_png(str(tmp_path / "e.png"))
    assert os.path.getsize(tmp_path / "e.png") > 0
