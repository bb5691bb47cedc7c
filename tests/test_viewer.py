import os

from voiceprintrecognition_paddlepaddle_tpu.infer_utils.viewer import PlotSpeaker


def test_plot_speaker_headless_draw(tmp_path):
    results = [{"speaker": 0, "start": 0.0, "end": 2.5},
               {"speaker": 1, "start": 2.5, "end": 4.0},
               {"speaker": 0, "start": 4.0, "end": 6.0}]
    out = str(tmp_path / "diar.png")
    PlotSpeaker(results).draw(out)
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_top_level_exports():
    import voiceprintrecognition_paddlepaddle_tpu as pkg
    assert pkg.Trainer.__name__ == "Trainer"
    assert pkg.Predictor.__name__ == "Predictor"
    assert pkg.__version__
