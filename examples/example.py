"""Chat-template generation demo (reference: /root/reference/example.py).

Usage: python examples/example.py /path/to/Qwen3-checkpoint
"""

import sys

from glm4_moe_nano_vllm_tpu import LLM, SamplingParams


def main():
    path = sys.argv[1]
    llm = LLM(path, enforce_eager=True, max_model_len=4096)
    tok = llm.tokenizer
    sampling_params = SamplingParams(temperature=0.6, max_tokens=256)
    prompts = ["introduce yourself", "list all prime numbers within 20"]
    prompts = [
        tok.apply_chat_template(
            [{"role": "user", "content": p}],
            tokenize=False, add_generation_prompt=True,
        )
        for p in prompts
    ]
    outputs = llm.generate(prompts, sampling_params)
    for prompt, output in zip(prompts, outputs):
        print("\n\nPrompt:", prompt)
        print("Completion:", output["text"])


if __name__ == "__main__":
    main()
