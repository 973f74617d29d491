from pytorchrec_tpu.data.process.splits import (
    check_leave_k_out_split,
    check_sequential_split,
    generate_leave_k_out_split,
    generate_sequential_split,
)
from pytorchrec_tpu.data.process.vt_negative_sample import (
    check_vt_negative_sample,
    generate_vt_negative_sample,
)
from pytorchrec_tpu.data.process.history import (
    check_interaction_history_list,
    check_interaction_next_state_list,
    generate_interaction_history_list,
    generate_interaction_next_state_list,
)
from pytorchrec_tpu.data.process.rl_sample import (
    check_rl_next_item_sample,
    generate_rl_next_item_sample,
)
from pytorchrec_tpu.data.process.dataset_info import check_dataset_info

__all__ = [
    "generate_sequential_split",
    "check_sequential_split",
    "generate_leave_k_out_split",
    "check_leave_k_out_split",
    "generate_vt_negative_sample",
    "check_vt_negative_sample",
    "generate_interaction_history_list",
    "check_interaction_history_list",
    "generate_interaction_next_state_list",
    "check_interaction_next_state_list",
    "generate_rl_next_item_sample",
    "check_rl_next_item_sample",
    "check_dataset_info",
]
