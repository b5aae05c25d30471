"""Quality-filter pipeline over multi-turn conversation transcripts.

Input shape (BASELINE input_hint): ``(conv_id string, turn_idx int,
role string, text string, tool string, ts timestamp)``.
"""
