"""Front-door CLI smoke tests (`python -m rayopt_tpu`, the missing
front door the reference never had -- its only CLIs are the
library/codev module mains, /root/reference/rayopt/library.py:164).

Run in-process via rayopt_tpu.__main__.main to share the suite's jit
caches instead of paying a fresh subprocess compile per case.
"""

import pytest

from rayopt_tpu.__main__ import load_system, main


@pytest.mark.slow
def test_cli_model_report(tmp_path, capsys):
    out = tmp_path / "doublet.html"
    main(["doublet", "-o", str(out), "--refocus"])
    cap = capsys.readouterr().out
    assert "wrote %s" % out in cap
    # the text tables were printed before the export line
    assert "focal length" in cap.lower() or "System" in cap
    html = out.read_text()
    assert "<html" in html
    assert "image/png" in html  # embedded figures


def test_cli_yaml_file(tmp_path):
    import rayopt_tpu as ro
    from rayopt_tpu.models import doublet
    p = tmp_path / "lens.yaml"
    p.write_text(ro.system_to_yaml(doublet()))
    s = load_system(str(p))
    s.update()
    assert len(s) == len(doublet())


def test_cli_zoom_config(capsys):
    # --no-plot: text tables only (skips all figure generation)
    main(["zoom", "--config", "1", "--no-plot"])
    assert capsys.readouterr().out  # text tables for the chosen config


def test_cli_unknown_format(tmp_path):
    p = tmp_path / "lens.xyz"
    p.write_text("")
    with pytest.raises(SystemExit):
        load_system(str(p))
