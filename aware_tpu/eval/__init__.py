from aware_tpu.eval.harness import run_robustness_eval, synthesize_speech_clip

__all__ = ["run_robustness_eval", "synthesize_speech_clip"]
