"""StreamAtt agent: AlignAtt + textual/speech history pruning for unbounded
streams.

Mirror of the reference (agents/streamatt.py): after each AlignAtt policy
step, keep only the last ``text_preserve_num`` words of the target history
(word boundary = leading-space token for non-Chinese, every token for
Chinese, ref :34-46), then truncate the audio history at the earliest
most-attended frame of the preserved text, clamped by min/max speech
duration (ref :51-56).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from infinisst_tpu.agents.alignatt import (
    AlignAttAgent,
    AlignAttOptions,
    AlignAttStates,
)


@dataclass
class StreamAttOptions(AlignAttOptions):
    text_preserve_num: int = 40
    min_speech_duration: float = 10.0
    max_speech_duration: float = 28.8


class StreamAttAgent(AlignAttAgent):
    def policy(self, states: Optional[AlignAttStates] = None):
        if states is None:
            states = self.states
        opts: StreamAttOptions = self.opts

        action = super().policy(states)

        if states is not None and not states.source_finished:
            if opts.text_preserve_num != -1:
                n_words = opts.text_preserve_num
                preserved = []
                for idx in states.target_ids[::-1]:
                    preserved.append(idx)
                    is_boundary = (
                        opts.target_lang == "Chinese"
                        or self.tokenizer.decode([idx]).startswith(" ")
                    )
                    if is_boundary:
                        n_words -= 1
                        if n_words == 0:
                            break
                preserved = preserved[::-1]
                while "�" in self.tokenizer.decode(preserved):
                    preserved.pop(0)
                states.target_ids = preserved

                if states.target_ids and states.most_attended_indices:
                    attended = states.most_attended_indices[
                        -len(states.target_ids) :
                    ]
                    src_idx = int(min(attended))
                    src_idx = min(
                        src_idx,
                        max(
                            0,
                            len(states.source)
                            - int(opts.min_speech_duration * 16000),
                        ),
                    )
                    states.source = states.source[src_idx:]

            states.source = states.source[
                -int(opts.max_speech_duration * 16000) :
            ]
            states.src_len = len(states.source)

        return action
