"""GLM-4 MoE generation demo (reference: /root/reference/example-glm.py).

Usage: python examples/example_glm.py /path/to/GLM-4.5-Air-checkpoint
"""

import sys

from glm4_moe_nano_vllm_tpu import LLM, SamplingParams


def main():
    path = sys.argv[1]
    llm = LLM(path, enforce_eager=True, max_model_len=4096)
    tok = llm.tokenizer
    sampling_params = SamplingParams(temperature=0.0, max_tokens=64)
    prompts = ["1+1+1="]
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
    print("\nmetrics:", llm.metrics.summary())


if __name__ == "__main__":
    main()
